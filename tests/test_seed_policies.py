"""Coverage for the seed-policy family on a tiny synthetic canvas."""

import numpy as np
import pytest

from ffn_tpu.inference import movement, seed as seed_lib, storage


class FakeCanvas:
    def __init__(self, image, segmentation=None):
        self.image = image
        self.shape = image.shape
        self.margin = np.array([2, 2, 2])
        self.segmentation = segmentation if segmentation is not None \
            else np.zeros(image.shape, np.int32)
        self.restrictor = movement.MovementRestrictor()
        self.voxel_size_zyx = (1, 1, 1)


def make_canvas():
    rng = np.random.RandomState(0)
    image = rng.rand(20, 20, 20).astype(np.float32)
    image[8:12, 8:12, 8:12] += 2.0   # bright blob
    return FakeCanvas(image)


def test_policy_grid3d():
    canvas = make_canvas()
    policy = seed_lib.PolicyGrid3d(canvas, step=8, offsets=(0, 4))
    coords = list(policy)
    assert coords
    for c in coords:
        assert all(2 <= v < 18 for v in c)  # margin filtered


def test_policy_grid2d():
    canvas = make_canvas()
    policy = seed_lib.PolicyGrid2d(canvas, step=8, offsets=(4,))
    coords = list(policy)
    zs = {c[0] for c in coords}
    assert zs == set(range(2, 18))


def test_policy_max():
    canvas = make_canvas()
    policy = seed_lib.PolicyMax(canvas)
    first = next(policy)
    # Highest-intensity voxel within margin comes first.
    assert canvas.image[first] == canvas.image[2:18, 2:18, 2:18].max()


def test_policy_max_peaks():
    canvas = make_canvas()
    policy = seed_lib.PolicyMaxPeaks(canvas, min_distance=2)
    coords = list(policy)
    assert coords
    blob = [c for c in coords if all(7 <= v <= 12 for v in c)]
    assert blob


def test_policy_dense_seeds():
    canvas = make_canvas()
    policy = seed_lib.PolicyDenseSeeds(canvas, threshold=2.0)
    coords = list(policy)
    assert coords
    for c in coords:
        assert canvas.image[c] > 2.0


def test_reverse_coords():
    canvas = make_canvas()
    fwd = list(seed_lib.PolicyGrid3d(canvas, step=8, offsets=(4,)))
    rev = list(seed_lib.ReverseCoords(canvas, "PolicyGrid3d", step=8,
                                      offsets=(4,)))
    assert rev == fwd[::-1]


def test_sequential_policies():
    canvas = make_canvas()
    combo = seed_lib.SequentialPolicies(
        canvas, policies=[("PolicyGrid3d", {"step": 8, "offsets": (4,)}),
                          ("PolicyMaxPeaks", {"min_distance": 2})])
    coords = list(combo)
    solo_a = list(seed_lib.PolicyGrid3d(canvas, step=8, offsets=(4,)))
    assert coords[:len(solo_a)] == solo_a
    assert len(coords) > len(solo_a)


def test_policy_fill_empty_space():
    canvas = make_canvas()
    canvas.segmentation[...] = 1
    canvas.segmentation[6:14, 6:14, 6:14] = 0   # interior unsegmented hole
    policy = seed_lib.PolicyFillEmptySpace(canvas)
    coords = list(policy)
    assert coords
    for c in coords:
        assert canvas.segmentation[c] == 0
    # The EDT peak of the hole is at its center.
    assert (9, 9, 9) in coords or (10, 10, 10) in coords


def test_policy_invert_origins(tmp_path):
    canvas = make_canvas()
    corner = (0, 0, 0)
    origins = {1: storage.OriginInfo((5, 5, 5), 10, 1.0),
               2: storage.OriginInfo((9, 9, 9), 20, 2.0)}
    storage.save_subvolume(np.zeros((20, 20, 20), np.int32), origins,
                           storage.segmentation_path(str(tmp_path), corner))
    policy = seed_lib.PolicyInvertOrigins(
        canvas, corner=corner, segmentation_dir=str(tmp_path))
    coords = list(policy)
    # Descending id order.
    assert coords == [(9, 9, 9), (5, 5, 5)]


def test_policy_peaks2d():
    canvas = make_canvas()
    policy = seed_lib.PolicyPeaks2d(canvas, min_distance=2,
                                    threshold_abs=0.5)
    coords = list(policy)
    assert coords
    # Ascending sort by default.
    assert coords == sorted(coords)


def test_base_policy_state_roundtrip():
    canvas = make_canvas()
    policy = seed_lib.PolicyGrid3d(canvas, step=8, offsets=(4,))
    first = next(policy)
    state = policy.get_state()
    policy2 = seed_lib.PolicyGrid3d(canvas, step=8, offsets=(4,))
    policy2.set_state(state)
    assert next(policy2) != first  # resumes after the consumed seed
    state_prev = policy.get_state(previous=True)
    policy3 = seed_lib.PolicyGrid3d(canvas, step=8, offsets=(4,))
    policy3.set_state(state_prev)
    assert next(policy3) == first  # 'previous' rewinds the in-flight seed
