from wst_tpu.models.forest import TreeEnsembleClassifier

__all__ = ["TreeEnsembleClassifier"]
