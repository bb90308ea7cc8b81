from wst_tpu.analysis.analyzer import NoiseExperimentAnalyzer, NOISE_FAMILIES

__all__ = ["NoiseExperimentAnalyzer", "NOISE_FAMILIES"]
