"""documentprocessor_ray — Ray-Data-native document extraction engine.

Public surface:

- pipelines.extract.run_extraction / run_scored_extraction — the flagship
  interleaved text+media pipeline (and its model-scored variant)
- state.checkpoint.run_partitioned — resumable partitioned runs
- corpus.generate_corpus / MediaStore — seeded synthetic corpus + page store
- oracle.* — the single-process conformance oracle (shared operator chain)
- functions.* — training-data operators (dedup, similarity, text analysis)
- stages.* — image preprocessing, scorer, multimodal, debug stages
- config.load_config + run.main — YAML job config and CLI driver
"""

__version__ = "0.1.0"
