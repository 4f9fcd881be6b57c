from .pages import read_pages, synth_pages
from .tables import read_table

__all__ = ["read_pages", "synth_pages", "read_table"]
