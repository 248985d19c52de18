"""The shipped example scripts run headless end-to-end.

Each mirrors one of the reference's notebooks
(/root/reference/examples/*.ipynb) on synthetic data; these tests execute
their ``main()`` into a tmp dir and check the workflow's recovered
quantity, so the examples can never rot.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

EXAMPLES = Path(__file__).parent.parent / "examples"
sys.path.insert(0, str(EXAMPLES))


def test_colmap_detections_example(tmp_path):
    import colmap_detections

    located, objects = colmap_detections.main(tmp_path / "out")
    assert len(located) == len(objects)
    d = np.linalg.norm(located[:, None, :] - objects[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 0.1


def test_project_detections_example(tmp_path):
    import project_detections

    n_points = project_detections.main(tmp_path / "out")
    assert n_points >= 2


def test_concept_figure_example(tmp_path):
    import concept_figure

    agreement = concept_figure.main(tmp_path / "out")
    assert agreement > 0.9
    assert (tmp_path / "out" / "figures" / "concept_views.png").exists()


@pytest.mark.slow
def test_aggregate_predictions_example(tmp_path):
    import aggregate_predictions

    accuracy = aggregate_predictions.main(tmp_path / "out")
    assert accuracy == 1.0


@pytest.mark.slow
def test_render_labels_example(tmp_path):
    import render_labels

    n_rendered = render_labels.main(tmp_path / "out")
    assert n_rendered >= 4
