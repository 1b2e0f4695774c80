"""ocr_ray — a Ray-Data-native per-turn main-content extraction engine.

Built from scratch with the query/data-processing capabilities of the
reference app (MehdiAPBS/OCR: upload PDF -> engine dispatch -> structured
record -> normalize defaults -> sinks), re-expressed as an idiomatic Ray
Data pipeline over Parquet tables of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
  core/       deterministic extraction kernels shared by the single-threaded
              oracle (``refimpl``) and the distributed pipeline — this shared
              code is what makes "per-turn text equality" hold by construction.
  stages/     Ray Data stage callables (stateless fns + stateful actor classes).
  sources/    readers + deterministic fixture generation (transcripts table).
  functions/  scalar/vector function library (pyarrow.compute wrappers).
  pipelines/  end-to-end pipeline builders (extraction flagship, relational).
  state/      partitioned sink, manifests, checkpointed resume.
  ops/        large-scale training-data ops: dedup, ANN, text analysis,
              multimodal stubs.
"""

__version__ = "0.1.0"
