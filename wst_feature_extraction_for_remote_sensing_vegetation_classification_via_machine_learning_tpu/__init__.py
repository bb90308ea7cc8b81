"""Alias package: the full project name re-exporting :mod:`wst_tpu`.

``import wst_feature_extraction_for_remote_sensing_vegetation_classification_via_machine_learning_tpu``
is equivalent to ``import wst_tpu`` (the canonical short name).
"""

from wst_tpu import *            # noqa: F401,F403
from wst_tpu import __version__  # noqa: F401
import sys as _sys
import wst_tpu as _w

# Make submodules importable under the long name too.
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith("wst_tpu"):
        _sys.modules[_name.replace(
            "wst_tpu",
            "wst_feature_extraction_for_remote_sensing_vegetation_"
            "classification_via_machine_learning_tpu", 1)] = _mod
