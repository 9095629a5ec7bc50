"""nifi_processors_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch rebuild of the data-processing capabilities of the
reference repo ``swiftj/nifi-processors`` (a NiFi ↔ AWS Kinesis
source/sink pair) as an idiomatic Ray Data engine:

- ``sources.tailer``   — change-event tailer (the ``GetKinesisStream`` role:
  ``consumer/GetKinesisStream.java:75-347``) reading an ordered Parquet
  change log in seq windows with schema unification.
- ``stages.validate``  — stateless per-batch parse/route/enrich (the NiFi
  processor logic: per-record skip-on-error at
  ``consumer/GetKinesisStream.java:272-278`` becomes vectorized row
  routing to a ``rejected`` side table).
- ``stages.merge``     — hash-partitioned stateful merge/upsert stage (the
  ``PutKinesisStream`` role: ``producer/PutKinesisStream.java:69-377``,
  upgraded from at-least-once to exactly-once) applying last-writer-wins
  upserts into a partitioned Parquet lake with copy-on-write rewrite.
- ``state.manifest``   — two-phase-commit manifest + per-partition
  watermarks + lineage log (the exactly-once upgrade over the
  reference's checkpoint-then-commit gap, ``GetKinesisStream.java:283-295``).
- ``functions``        — scalar/batch function library: stable hashing,
  text analysis, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  embedding similarity search.
- ``pipelines``        — replay driver, metrics, and the query catalog.

Everything is built on ``ray.data.Dataset`` pipelines: ``map_batches``
over zero-copy Arrow batches for stateless work, ``groupby(...).
map_groups`` with callable-class actors for the stateful partitioned
merge, and exactly one shuffle per replay epoch (the hash partition on
the merge key).
"""

__version__ = "0.1.0"

# Installs the targeted log filter for Ray's schema-less empty sort
# blocks (see functions/blocks.py) — real schema drift still warns.
from .functions import blocks as _blocks  # noqa: E402,F401
