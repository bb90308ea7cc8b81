from wst_tpu.features.extractor import (FeatureExtractor, get_feature_names,
                                        METHODS)
from wst_tpu.features.selection import fit_select_kbest, SelectionModel

__all__ = ["FeatureExtractor", "get_feature_names", "METHODS",
           "fit_select_kbest", "SelectionModel"]
