"""Experiment configuration: one dataclass instead of per-script argparse.

Field names mirror the reference's config dict keys (reference: src/training/
train_and_save_model.py:447-458) so emitted reports are schema-identical.
The factorial grid of the reference (areas x sizes x methods x k x noise
variants) is expressed as config products via :func:`grid`.
"""

from __future__ import annotations

import dataclasses
import itertools
import os
from typing import Iterator, List, Optional, Sequence


@dataclasses.dataclass
class ExperimentConfig:
    dataset_path: str
    area_name: str
    feature_method: str          # advanced_stats | wst | hybrid
    k_features: int
    output_dir: str
    n_estimators: int = 50
    test_size: float = 0.2
    random_state: int = 42
    cv_folds: int = 5
    # TPU-native extensions (absent from reference; defaulted so reference
    # configs round-trip unchanged):
    J: int = 2
    L: int = 8
    batch_size: int = 64
    scattering_mode: Optional[str] = None   # fft | matmul | None=auto
    # 'reflect' = kymatio-faithful parity boundary (default); 'periodic' =
    # lane-aligned TPU fast mode (~2.3x scattering throughput,
    # boundary-only feature difference — docs/ARCHITECTURE.md).  Train and
    # infer must use the same boundary.
    boundary: str = "reflect"

    def __post_init__(self):
        if self.feature_method not in ("advanced_stats", "wst", "hybrid"):
            raise ValueError(
                f"Unknown feature method: {self.feature_method!r}")

    @property
    def dataset_type(self) -> str:
        return os.path.basename(os.path.normpath(self.dataset_path))

    def resolve_n_estimators(self) -> int:
        """The reference's size heuristic: when the user left the default 50,
        mini->3, small->10, original->50 (reference: src/training/
        train_and_save_model.py:433-445)."""
        if self.n_estimators != 50:
            return self.n_estimators
        dt = self.dataset_type
        if "mini" in dt:
            return 3
        if "small" in dt:
            return 10
        return 50

    def to_report_dict(self) -> dict:
        return {
            "dataset_path": self.dataset_path,
            "area_name": self.area_name,
            "feature_method": self.feature_method,
            "k_features": self.k_features,
            "output_dir": self.output_dir,
            "n_estimators": self.resolve_n_estimators(),
            "test_size": self.test_size,
            "random_state": self.random_state,
            "cv_folds": self.cv_folds,
            # TPU-native extraction axes (schema superset — reference
            # configs lack these keys and default on load).  Serializing
            # them makes every artifact self-describing: inference
            # reconstructs its extractor from the saved config instead of
            # assuming defaults, closing the train/serve feature-mismatch
            # defect class the reference shipped (reference:
            # src/inference/inference.py:277-280, the 486/492 wst bug).
            "J": self.J,
            "L": self.L,
            "boundary": self.boundary,
        }


def grid(dataset_paths: Sequence[str], areas: Sequence[str],
         methods: Sequence[str], ks: Sequence[int], output_root: str,
         **overrides) -> Iterator[ExperimentConfig]:
    """The reference's factorial grid as a config product.

    Output directory convention matches the reference corpus:
    ``{output_root}/{area}/{dataset_type}/k{k}/{method}`` (SURVEY.md §1,
    contract between L3 and L4).
    """
    for ds, area, method, k in itertools.product(dataset_paths, areas,
                                                 methods, ks):
        dt = os.path.basename(os.path.normpath(ds))
        out = os.path.join(output_root, area, dt, f"k{k}", method)
        yield ExperimentConfig(dataset_path=ds, area_name=area,
                               feature_method=method, k_features=k,
                               output_dir=out, **overrides)


def expand_grid(*args, **kwargs) -> List[ExperimentConfig]:
    return list(grid(*args, **kwargs))
