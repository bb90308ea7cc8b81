from wst_tpu.train.splits import (stratified_kfold_indices,
                                  stratified_train_test_split)
from wst_tpu.train.metrics import (accuracy_score, classification_report,
                                   confusion_matrix)

__all__ = ["stratified_kfold_indices", "stratified_train_test_split",
           "accuracy_score", "classification_report", "confusion_matrix"]
