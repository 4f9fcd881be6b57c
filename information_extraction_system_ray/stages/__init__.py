from .strip import extract_text
from .tagger import CrfTagger, tag_pages
from .triple_extract import extract_triples_stage
from .linker import LinkMentions, link_pages
from .canonicalize import (connected_components, distinct_edges,
                           mention_entity_edges, partial_mention_edges)
from .graph import build_edges, build_nodes

__all__ = [
    "extract_text", "CrfTagger", "tag_pages", "extract_triples_stage",
    "LinkMentions", "link_pages", "connected_components",
    "mention_entity_edges", "partial_mention_edges", "distinct_edges",
    "build_nodes", "build_edges",
]
