from .manifest import Manifest
from .broadcast import put_once

__all__ = ["Manifest", "put_once"]
