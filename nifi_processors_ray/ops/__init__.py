"""Large-scale training-data operators over document / embedding tables.

Beyond the reference's stream-in/stream-out pair, a 100 TB training-data
pipeline needs corpus hygiene and retrieval primitives.  Every operator
here is a Ray Data pipeline over zero-copy Arrow batches:

- :mod:`.text` — token statistics, quality scoring, language ID,
  document fingerprinting (stateless vectorized ``map_batches``).
- :mod:`.dedup` — exact, MinHash+LSH, SimHash and embedding-cosine
  near-duplicate detection (``map_batches`` signature stages + ONE
  bucket ``groupby`` each; signatures travel WITH the rows through the
  shuffle so verification needs no second join).
- :mod:`.similarity` — brute-force cosine top-k (broadcast query
  matrix) and an IVF-bucketed approximate variant (the scale path).
- :mod:`.multimodal` — opaque binary media columns with typed
  metadata; decode/feature-extract as an actor-pool stage (real codec
  libraries are absent here, so decode is a clearly-marked
  deterministic stub — the Ray-side plumbing is real and tested).
- :mod:`.events` — stream analytics: tumbling-window aggregation,
  sessionization, top-k, distinct, deterministic sampling.
- :mod:`.relational` — broadcast lookup join, TPC-H-style wide
  aggregation, and an as-of join composed from a broadcast sorted
  index + per-batch binary search.
"""
