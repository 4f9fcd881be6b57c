"""Union-find (disjoint set) with deterministic min-label canonicalization.

Used by the refimpl oracle for single-process canonicalization
(SURVEY.md §2 G2); cluster id = lexicographic min of member ids, so cluster
assignment is permutation-invariant — the property the distributed salted
groupby + label-propagation implementation must reproduce exactly
(FIXTURES.md §7, property-tested with hypothesis).
"""

from __future__ import annotations


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        # iterative with full path compression: chains can be thousands of
        # links deep before compression (e.g. unions arriving in descending
        # order along a path graph), and a recursive find would blow the
        # interpreter stack long before the driver-side edge budget is hit
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller string wins as root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def components(self) -> dict[str, str]:
        """member -> canonical (min) member id for every seen element."""
        roots = {x: self.find(x) for x in list(self.parent)}
        # root chosen by union order is already the min string because union
        # always keeps the smaller root; finalize anyway for safety
        members: dict[str, list[str]] = {}
        for x, r in roots.items():
            members.setdefault(r, []).append(x)
        out: dict[str, str] = {}
        for r, xs in members.items():
            m = min(xs)
            for x in xs:
                out[x] = m
        return out
