"""clawrag_ray — Ray-Data-native document extraction engine.

A from-scratch rebuild of the extraction core of 2dogsandanerd/ClawRag
(surveyed in SURVEY.md; reference snapshot at /root/reference, read-only).

Layout:
  reference/  frozen single-threaded reference extractor (the correctness oracle)
  corpus.py   deterministic synthetic interleaved text+media corpus generator
  stages/     Ray Data batch-transform stages (route, extract, dedup, quality, ...)
  sources/    readers (parquet, lance-gated, loaders re-expressed over columns)
  functions/  vectorized pyarrow/numpy kernels shared by stages
  pipelines/  end-to-end pipeline assembly (extraction flagship, resume logic)
  state/      checkpoint manifest + per-partition lineage/metrics

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by bench.py, CLI entry points and the pytest fixture only.
"""

__version__ = "0.1.0"
