from anomaly_detector_spark.sources.io import (  # noqa: F401
    read_multivariate_csv,
    read_transcripts_csv,
    read_transcripts_parquet,
)
