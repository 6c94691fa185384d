import jax.numpy as jnp
import numpy as np
import pytest

from jointimagegeneration_tpu.eval.metrics import (
    confusion_matrix,
    dice_from_confusion,
    frechet_distance,
    generalized_energy_distance,
    hungarian_matched_iou,
    per_class_dice,
    per_class_precision_recall,
)


def test_confusion_matrix_counts():
    pred = jnp.asarray([0, 1, 1, 2])
    tgt = jnp.asarray([0, 1, 2, 2])
    cm = np.asarray(confusion_matrix(pred, tgt, 3))
    expected = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 1]])
    np.testing.assert_array_equal(cm, expected)


def test_dice_perfect_and_disjoint():
    a = jnp.asarray([0, 0, 1, 1])
    d = np.asarray(per_class_dice(a, a, 2))
    np.testing.assert_allclose(d, 1.0)
    b = jnp.asarray([1, 1, 0, 0])
    d2 = np.asarray(per_class_dice(a, b, 2))
    np.testing.assert_allclose(d2, 0.0)


def test_dice_ignore_index():
    a = jnp.asarray([0, 1, 2])
    d = np.asarray(per_class_dice(a, a, 3, ignore_index=0))
    assert d.shape == (2,)


def test_precision_recall():
    pred = jnp.asarray([1, 1, 1, 0])
    tgt = jnp.asarray([1, 1, 0, 0])
    p, r = per_class_precision_recall(pred, tgt, 2)
    np.testing.assert_allclose(np.asarray(p), [1.0, 2 / 3])
    np.testing.assert_allclose(np.asarray(r), [0.5, 1.0])


def test_ged_identical_sets_is_zero():
    rng = np.random.default_rng(0)
    vols = rng.integers(0, 3, size=(3, 4, 4, 4))
    ged = generalized_energy_distance(vols, vols.copy(), 3)
    assert ged == pytest.approx(0.0, abs=1e-9)


def test_hungarian_matched_iou_perfect():
    rng = np.random.default_rng(1)
    vols = rng.integers(0, 3, size=(3, 4, 4))
    hm = hungarian_matched_iou(vols, vols[::-1].copy(), 3)
    assert hm == pytest.approx(1.0)


def test_frechet_distance_identity_and_shift():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((200, 8))
    assert frechet_distance(a, a.copy()) == pytest.approx(0.0, abs=1e-6)
    b = a + 3.0
    assert frechet_distance(a, b) == pytest.approx(8 * 9.0, rel=0.05)


def test_annotate_grid():
    from jointimagegeneration_tpu.eval.writers import annotate_grid, make_grid

    grid = make_grid([np.zeros((16, 16, 3), np.uint8)] * 2)
    out = annotate_grid(grid, "case 01 t=500")
    assert out.shape == grid.shape
    assert out.sum() > grid.sum()  # pixels were drawn
