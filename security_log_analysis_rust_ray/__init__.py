"""security_log_analysis_rust_ray — a Ray-Data-native rebuild of
`ddboline/security_log_analysis_rust`'s parse -> enrich -> route -> aggregate
pipeline over transcript Parquet corpora, plus the training-data ops
(dedup / similarity / ANN / text analysis / multimodal plumbing) a
large-scale pipeline needs.  See COVERAGE.md for the operator map."""

__version__ = "0.1.0"

__all__ = [
    "synth",
    "schemas",
    "sources",
    "functions",
    "stages",
    "pipelines",
    "state",
]
