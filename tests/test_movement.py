import numpy as np
import pytest

from ffn_tpu.inference import movement


def test_scored_move_offsets_golden():
    # 9x9x9 map, deltas (2,2,2). Plant maxima on specific faces.
    prob = np.zeros((9, 9, 9), np.float32)
    center = (4, 4, 4)
    # +z face (z=6): max at (6, 3, 5) -> offset (2, -1, 1)
    prob[6, 3, 5] = 0.95
    # -y face (y=2): max at (5, 2, 4) -> offset (1, -2, 0)
    prob[5, 2, 4] = 0.97
    # +x face (x=6): below threshold.
    prob[4, 4, 6] = 0.5

    moves = list(movement.get_scored_move_offsets((2, 2, 2), prob,
                                                  threshold=0.9))
    moves_set = {(round(float(s), 4), off) for s, off in moves}
    assert (0.95, (2, -1, 1)) in moves_set
    assert (0.97, (1, -2, 0)) in moves_set
    # No move for the +x face or the other faces (all zeros < threshold).
    assert len(moves) == 2


def test_scored_move_offsets_zero_delta_axis():
    prob = np.full((9, 9, 9), 0.99, np.float32)
    moves = list(movement.get_scored_move_offsets((0, 2, 2), prob,
                                                  threshold=0.9))
    # Only y and x axes produce moves.
    axes = {tuple(np.sign(off)) for _, off in moves}
    for _, off in moves:
        assert off[0] != 2 and off[0] != -2


def test_scored_move_offsets_dedup():
    prob = np.full((5, 5, 5), 0.99, np.float32)
    # Uniform map: argmax picks index 0 on each face; some (score, offset)
    # pairs can coincide; ensure generator never repeats.
    moves = list(movement.get_scored_move_offsets((1, 1, 1), prob,
                                                  threshold=0.9))
    assert len(set(moves)) == len(moves)


class _FakeCanvas:
    def __init__(self):
        self.valid = set()

    def is_valid_pos(self, pos):
        return tuple(pos) in self.valid


def test_face_max_policy_fifo_and_dedup():
    canvas = _FakeCanvas()
    policy = movement.FaceMaxMovementPolicy(canvas, deltas=(2, 2, 2),
                                            score_threshold=0.9)
    policy.reset_state((10, 10, 10))

    prob = np.zeros((9, 9, 9), np.float32)
    prob[6, 4, 4] = 0.95   # +z move
    prob[2, 4, 4] = 0.99   # -z move
    policy.update(prob, (10, 10, 10))

    # Sorted descending by score: -z (0.99) queued first.
    canvas.valid = {(8, 10, 10), (12, 10, 10)}
    assert next(policy) == (8, 10, 10)
    assert next(policy) == (12, 10, 10)
    with pytest.raises(StopIteration):
        next(policy)


def test_face_max_policy_quantized_dedup():
    canvas = _FakeCanvas()
    policy = movement.FaceMaxMovementPolicy(canvas, deltas=(4, 4, 4),
                                            score_threshold=0.9)
    policy.reset_state((0, 0, 0))
    # Visiting (0,0,0) marks its lattice cell done.
    prob = np.zeros((9, 9, 9), np.float32)
    policy.update(prob, (0, 0, 0))
    # A candidate in the same lattice cell is skipped even if valid.
    canvas.valid = {(1, 1, 1), (4, 0, 0)}
    policy.scored_coords.append((0.95, (1, 1, 1)))   # same cell as origin
    policy.scored_coords.append((0.95, (4, 0, 0)))   # next cell over
    assert next(policy) == (4, 0, 0)


def test_face_max_policy_state_roundtrip():
    canvas = _FakeCanvas()
    policy = movement.FaceMaxMovementPolicy(canvas, deltas=(2, 2, 2),
                                            score_threshold=0.9)
    policy.reset_state((5, 5, 5))
    policy.scored_coords.append((0.95, [7, 5, 5]))
    policy.done_rounded_coords.add((0, 0, 0))
    state = policy.get_state()

    policy2 = movement.FaceMaxMovementPolicy(canvas, deltas=(2, 2, 2),
                                             score_threshold=0.9)
    policy2.restore_state(state)
    canvas.valid = {(7, 5, 5)}
    assert next(policy2) == (7, 5, 5)


def test_restrictor_mask():
    mask = np.zeros((10, 10, 10), bool)
    mask[5] = True
    r = movement.MovementRestrictor(mask=mask)
    assert not r.is_valid_pos((5, 3, 3))
    assert r.is_valid_pos((4, 3, 3))
    assert r.is_valid_seed((5, 3, 3))  # seed mask separate


def test_restrictor_seed_mask():
    seed_mask = np.zeros((10, 10, 10), bool)
    seed_mask[2] = True
    r = movement.MovementRestrictor(seed_mask=seed_mask)
    assert not r.is_valid_seed((2, 0, 0))
    assert r.is_valid_pos((2, 0, 0))
