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
    return BASE.alias_rows(distractor_frac)


# --------------------------------------------------------------------------
# Scalable entity universe (round 5)
#
# The r4 VERDICT's top finding: with a FIXED 95-entity universe the flagship
# KG is a constant ~104 nodes at every corpus scale, so the graph phases of
# the bench never face a corpus-proportional node/edge table. A ``Universe``
# bundles an entity population of any size; ``scaled_universe(n)`` extends
# the base 95 entities (kept verbatim — every golden fixture stays valid)
# with deterministically synthesized entities, and is a pure function of
# ``n`` so any Ray worker can reconstruct it from the scalar — the universe
# is never shipped, only its size.
# --------------------------------------------------------------------------

class Universe:
    """An entity population + the alias/gazetteer views derived from it."""

    __slots__ = ("persons", "orgs", "places", "entities", "by_id",
                 "hot_org", "n_extra", "_type_index")

    def __init__(self, persons: list[Entity], orgs: list[Entity],
                 places: list[Entity], n_extra: int = 0) -> None:
        self.persons = persons
        self.orgs = orgs
        self.places = places
        self.entities = persons + orgs + places
        self.by_id = {e.eid: e for e in self.entities}
        self.hot_org = orgs[0]
        self.n_extra = n_extra
        self._type_index = {}
        for pool in (persons, orgs, places):
            for i, e in enumerate(pool):
                self._type_index[e.eid] = i

    @property
    def is_base(self) -> bool:
        return self.n_extra == 0

    def pool(self, etype: str) -> list[Entity]:
        return {"PER": self.persons, "ORG": self.orgs,
                "LOC": self.places}[etype]

    def alias_rows(self, distractor_frac: float = 0.2
                   ) -> list[tuple[str, str, float]]:
        """Generalization of the module-level :func:`alias_rows` —
        bit-identical rows for the base universe (``pool.index(e)`` is
        replaced by the precomputed per-type index, the same value)."""
        rows: list[tuple[str, str, float]] = []
        k = 0
        for e in self.entities:
            pool = self.pool(e.etype)
            for rank, s in enumerate(e.aliases):
                rows.append((s, e.eid, round(1.0 / (1 + rank), 4)))
                k += 1
                if (k * 997) % 1000 < distractor_frac * 1000:
                    wrong = pool[(self._type_index[e.eid] + 1 + (k % 5))
                                 % len(pool)]
                    rows.append((s, wrong.eid, 0.9))
        return rows

    def gazetteer(self) -> frozenset:
        """Lowercased word set of every alias surface (the A5 gazetteer)."""
        return frozenset(w for surface, _e, _p in self.alias_rows()
                         for w in surface.lower().split())


# 60 CV syllables → unique synthesized proper names: 3 syllables cover
# 216k extras, a 4th prefix syllable extends to 12.9M — far beyond any
# bench scale (sf1 uses ~2k).
_SYL = [c + v for c in "bdgklmnrstvz" for v in "aeiou"]
_BASE_WORDS = frozenset(
    w.lower() for name in (_LAST + _ORG_NAMES + _PLACE_NAMES + _FIRST)
    for w in name.split())


def _syl_name(k: int) -> str:
    """Deterministic unique proper name for extra-entity index ``k``."""
    s = _SYL[(k // 3600) % 60] + _SYL[(k // 60) % 60] + _SYL[k % 60]
    if k >= 216_000:
        s = _SYL[(k // 216_000) % 60] + s
    return s.capitalize()


_ORG_SUFFIX = ["Systems", "Labs", "Group", "Holdings", "Industries",
               "Networks", "Analytics", "Software"]
_PLACE_SUFFIX = ["Bay", "Ridge", "Falls", "Harbor", "Vale", "Mesa",
                 "Point", "Grove"]


def scaled_universe(n_entities: int | None) -> Universe:
    """The deterministic ``n_entities``-entity universe; ``None`` or
    ``<= 95`` → the base universe (goldens unchanged). Extras cycle
    PER/ORG/LOC at 8:7:5 per 20 and get unique syllable names (collisions
    with base name words are skipped), canonical-prefixed aliases via the
    same alias builders, and signatures from the same closed pool — so the
    CRF's shape/gazetteer features and the linker's context profiles work
    identically on them. Pure function of ``n_entities`` (cached): Ray
    workers reconstruct it from the scalar instead of receiving a
    broadcast."""
    if n_entities is None or n_entities <= len(ENTITIES):
        return BASE
    return _scaled_universe_cached(int(n_entities))


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=8)
def _scaled_universe_cached(n_entities: int) -> Universe:
    n_extra = n_entities - len(ENTITIES)
    persons = list(PERSONS)
    orgs = list(ORGS)
    places = list(PLACES)
    made, k = 0, 0
    while made < n_extra:
        name = _syl_name(k)
        k += 1
        if name.lower() in _BASE_WORDS:
            continue  # never collide with a base alias word
        cyc = made % 20
        if cyc < 8:  # PER
            i = len(persons)
            first = _FIRST[(made * 13 + 7) % len(_FIRST)]
            persons.append(Entity(
                f"PER_{i:06d}", "PER", f"{first} {name}",
                _person_aliases(first, name), _sig(i, 0)))
        elif cyc < 15:  # ORG
            i = len(orgs)
            full = f"{name} {_ORG_SUFFIX[made % len(_ORG_SUFFIX)]}"
            orgs.append(Entity(f"ORG_{i:06d}", "ORG", full,
                               _org_aliases(full), _sig(i, 13)))
        else:  # LOC
            i = len(places)
            full = f"{name} {_PLACE_SUFFIX[made % len(_PLACE_SUFFIX)]}"
            places.append(Entity(f"LOC_{i:06d}", "LOC", full,
                                 _place_aliases(full), _sig(i, 29)))
        made += 1
    return Universe(persons, orgs, places, n_extra=n_extra)


BASE = Universe(PERSONS, ORGS, PLACES)
