from anomaly_detector_spark.data.synth import synth_registry, synth_transcripts

__all__ = ["synth_transcripts", "synth_registry"]
