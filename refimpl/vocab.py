"""Closed entity vocabulary + sentence grammar (FIXTURES.md §2).

40 PERSON, 30 ORG, 25 PLACE entities, each with alias surface variants and a
small set of deterministic "signature" context words (used by the pagegen so
that context-embedding entity linking has real signal), plus 12 typed
predicates with surface phrases. One ORG surface ("Wikipedia") receives ~30%
of all ORG slots to create head-entity skew (SURVEY.md §5 item 5).

Pure data — no randomness here; all draws happen in pagegen with seeded RNGs.
"""

from __future__ import annotations

_FIRST = [
    "Ada", "Grace", "Alan", "Edsger", "Donald", "Barbara", "John", "Margaret",
    "Claude", "Kurt", "Emmy", "Paul", "Sofia", "Niels", "Marie", "Rosalind",
    "Linus", "Dennis", "Kenneth", "Bjarne", "Guido", "Yukihiro", "Anders",
    "Brendan", "Radia", "Frances", "Katherine", "Dorothy", "Mary", "Annie",
    "Tim", "Vint", "Leslie", "Whitfield", "Martin", "Ralph", "Adi", "Ronald",
    "Shafi", "Silvio",
]
_LAST = [
    "Lovelace", "Hopper", "Turing", "Dijkstra", "Knuth", "Liskov", "McCarthy",
    "Hamilton", "Shannon", "Goedel", "Noether", "Erdos", "Kovalevskaya",
    "Bohr", "Curie", "Franklin", "Torvalds", "Ritchie", "Thompson",
    "Stroustrup", "Rossum", "Matsumoto", "Hejlsberg", "Eich", "Perlman",
    "Allen", "Johnson", "Vaughan", "Jackson", "Easley", "Berners", "Cerf",
    "Lamport", "Diffie", "Hellman", "Merkle", "Shamir", "Rivest",
    "Goldwasser", "Micali",
]

_ORG_NAMES = [
    "Wikipedia", "Acme Corporation", "Globex Industries", "Initech Systems",
    "Umbrella Labs", "Stark Dynamics", "Wayne Enterprises", "Tyrell Analytics",
    "Cyberdyne Research", "Aperture Science", "Hooli Networks",
    "Pied Piper Software", "Vandelay Imports", "Wonka Foods",
    "Gringotts Finance", "Duff Brewing", "Oscorp Technologies",
    "Soylent Nutrition", "Weyland Mining", "Monarch Aviation",
    "Nakatomi Trading", "Prestige Worldwide", "Bluth Development",
    "Dunder Mifflin Paper", "Sterling Cooper Media", "Massive Dynamic",
    "Gekko Capital", "Zorg Logistics", "Virtucon Holdings", "Rekall Memory",
]

_PLACE_NAMES = [
    "Springfield", "Gotham City", "Metropolis", "Emerald City", "Atlantis",
    "Rivendell", "Winterfell", "Neo Tokyo", "Zion Harbor", "Arrakis Basin",
    "Trantor", "Coruscant Heights", "Vulcan Ridge", "Krypton Falls",
    "Shangri Vale", "Eldorado Flats", "Avalon Bay", "Camelot Downs",
    "Asgard Point", "Valhalla Mesa", "Olympus Junction", "Elysium Fields",
    "Arcadia Grove", "Utopia Planitia", "Xanadu Terrace",
]

# Signature context words: 5 per entity, drawn deterministically from a closed
# pool so every entity's context profile is distinct but overlapping.
_SIGNATURE_POOL = [
    "algorithm", "compiler", "theorem", "lattice", "protocol", "quantum",
    "ledger", "turbine", "reactor", "synthesis", "archive", "catalog",
    "harbor", "festival", "museum", "granite", "orchard", "meadow", "summit",
    "canyon", "cipher", "kernel", "tensor", "circuit", "polymer", "enzyme",
    "glacier", "monsoon", "saffron", "cobalt", "indigo", "amber", "sonnet",
    "ballad", "fresco", "mosaic", "anvil", "loom", "quill", "sextant",
]


def _person_aliases(first: str, last: str) -> list[str]:
    return [f"{first} {last}", f"{first[0]}. {last}", last]


def _org_aliases(name: str) -> list[str]:
    parts = name.split()
    out = [name]
    if len(parts) > 1:
        out.append(parts[0])  # "Acme Corporation" -> "Acme"
        out.append(parts[0] + " " + parts[1][:4] + ".")  # "Acme Corp."
    return out


def _place_aliases(name: str) -> list[str]:
    parts = name.split()
    out = [name]
    if len(parts) > 1:
        out.append(parts[-1] + " of " + parts[0])
    return out


def _sig(i: int, salt: int) -> list[str]:
    n = len(_SIGNATURE_POOL)
    return [_SIGNATURE_POOL[(i * 7 + k * 11 + salt) % n] for k in range(5)]


class Entity:
    __slots__ = ("eid", "etype", "canonical", "aliases", "signature")

    def __init__(self, eid: str, etype: str, canonical: str,
                 aliases: list[str], signature: list[str]):
        self.eid = eid
        self.etype = etype            # PER | ORG | LOC
        self.canonical = canonical
        self.aliases = aliases        # first alias == canonical
        self.signature = signature    # context words for linking

    def __repr__(self) -> str:  # pragma: no cover
        return f"Entity({self.eid}, {self.canonical!r})"


PERSONS = [
    Entity(f"PER_{i:03d}", "PER", f"{f} {l}", _person_aliases(f, l), _sig(i, 0))
    for i, (f, l) in enumerate(zip(_FIRST, _LAST))
]
ORGS = [
    Entity(f"ORG_{i:03d}", "ORG", n, _org_aliases(n), _sig(i, 13))
    for i, n in enumerate(_ORG_NAMES)
]
PLACES = [
    Entity(f"LOC_{i:03d}", "LOC", n, _place_aliases(n), _sig(i, 29))
    for i, n in enumerate(_PLACE_NAMES)
]
ENTITIES: list[Entity] = PERSONS + ORGS + PLACES
BY_ID: dict[str, Entity] = {e.eid: e for e in ENTITIES}

HOT_ORG = ORGS[0]  # "Wikipedia" — receives ~30% of ORG slots (skew fixture)

# predicate id -> (surface phrase, subj type, obj type)
PREDICATES: dict[str, tuple[str, str, str]] = {
    "founded": ("founded", "PER", "ORG"),
    "works_at": ("works at", "PER", "ORG"),
    "born_in": ("was born in", "PER", "LOC"),
    "located_in": ("is located in", "ORG", "LOC"),
    "acquired": ("acquired", "ORG", "ORG"),
    "leads": ("leads", "PER", "ORG"),
    "studied_at": ("studied at", "PER", "ORG"),
    "moved_to": ("moved to", "PER", "LOC"),
    "partnered_with": ("partnered with", "ORG", "ORG"),
    "visited": ("visited", "PER", "LOC"),
    "headquartered_in": ("is headquartered in", "ORG", "LOC"),
    "invested_in": ("invested in", "ORG", "ORG"),
}
# phrase -> pred id, longest phrase first so greedy matching is unambiguous
PHRASE_TO_PRED: list[tuple[str, str]] = sorted(
    ((phrase, pid) for pid, (phrase, _, _) in PREDICATES.items()),
    key=lambda t: -len(t[0]),
)

# Filler vocabulary for non-entity tokens (word salad; all lowercase so the
# CRF's capitalization features carry signal).
FILLER = [
    "the", "a", "an", "and", "or", "of", "in", "on", "for", "with", "report",
    "notes", "survey", "update", "review", "market", "local", "annual",
    "public", "recent", "study", "shows", "small", "large", "early", "late",
    "plan", "draft", "broad", "quiet", "open", "civic", "rural", "urban",
]

BIO_LABELS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC"]
LABEL_TO_ID = {l: i for i, l in enumerate(BIO_LABELS)}
TYPE_TO_BI = {"PER": ("B-PER", "I-PER"), "ORG": ("B-ORG", "I-ORG"),
              "LOC": ("B-LOC", "I-LOC")}


def alias_rows(distractor_frac: float = 0.2) -> list[tuple[str, str, float]]:
    """(surface, entity_id, prior) rows for the alias dictionary.

    Every alias of every entity maps to its entity with prior ∝ 1/rank.
    Additionally ~``distractor_frac`` of surfaces also map to a *wrong*
    entity of the same type with a competitive prior, so dictionary lookup
    alone is ambiguous and context-embedding scoring is exercised
    (FIXTURES.md §6).
    """
    rows: list[tuple[str, str, float]] = []
    by_type = {"PER": PERSONS, "ORG": ORGS, "LOC": PLACES}
    k = 0
    for e in ENTITIES:
        for rank, s in enumerate(e.aliases):
            rows.append((s, e.eid, round(1.0 / (1 + rank), 4)))
            k += 1
            if (k * 997) % 1000 < distractor_frac * 1000:
                pool = by_type[e.etype]
                wrong = pool[(pool.index(e) + 1 + (k % 5)) % len(pool)]
                rows.append((s, wrong.eid, 0.9))
    return rows
