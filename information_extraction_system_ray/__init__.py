"""information_extraction_system_ray — Ray-Data-native KG-construction engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities
of the reference ``adamkhazi/information-extraction-system`` (a single-process
linear-chain-CRF information extractor; semantics defined by the in-repo
``refimpl`` oracle, see SURVEY.md §0), re-expressed Ray-Data-first:

- every logical table is a ``ray.data.Dataset`` of Arrow blocks
- per-record transforms are vectorized ``map_batches`` (zero-copy pyarrow)
- stateful stages (CRF weights, alias dict, embedding profiles) are actor
  pools with state built once in ``__init__``
- wide steps (canonicalization, dedup, graph materialize) are explicit
  groupby / sort shuffles with partial pre-aggregation and salt-ready keys
- outputs are partitioned Parquet + per-partition lineage manifests (resume)

Layout: ``sources/`` readers+synthesizers, ``stages/`` flagship KG stages,
``functions/`` vectorized kernels (dedup, similarity, text analysis),
``pipelines/`` composed DAGs, ``state/`` broadcast + manifest/lineage.

Library code never calls ``ray.init()`` — sessions are owned by the
driver, ``bench.py``, the ``python -m information_extraction_system_ray`` CLI (guarded init),
or the pytest fixture (driver contract, __ray_entry__.py:11-13).
"""

__version__ = "0.1.0"
