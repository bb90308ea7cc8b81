from wst_tpu.infer.inference import ModelInference

__all__ = ["ModelInference"]
