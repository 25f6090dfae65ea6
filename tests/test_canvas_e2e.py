"""End-to-end canvas test against an independent numpy oracle.

The oracle reimplements the reference's Canvas semantics
(ffn/inference/inference.py: update_at, segment_at, segment_all) directly
in numpy, sharing no code with ffn_tpu.inference.canvas. Both run the same
rule-based model over the same synthetic volume; segmentations must agree
voxel-for-voxel.
"""

from collections import deque

import numpy as np
from scipy.special import expit, logit

from ffn_tpu.inference import canvas as canvas_lib
from ffn_tpu.inference import engine as engine_lib
from ffn_tpu.inference import seed as seed_lib
from ffn_tpu.models import oracle
from ffn_tpu.proto import inference_pb2

FOV = 9
DELTAS = (2, 2, 2)


def make_options():
    opts = inference_pb2.InferenceOptions()
    opts.init_activation = 0.95
    opts.pad_value = 0.05
    opts.move_threshold = 0.9
    opts.segment_threshold = 0.6
    opts.min_segment_size = 5
    opts.min_boundary_dist.x = 1
    opts.min_boundary_dist.y = 1
    opts.min_boundary_dist.z = 1
    opts.disco_seed_threshold = 0.0
    return opts


def make_image():
    """Synthetic volume: an L-shaped blob, a small separate blob, dust."""
    img = np.full((36, 36, 36), -1.0, np.float32)
    img[6:12, 6:30, 6:12] = 1.0     # bar along y
    img[6:12, 24:30, 6:24] = 1.0    # bar along x (connected -> L shape)
    img[24:30, 24:30, 24:30] = 1.0  # separate cube
    img[18, 6, 20] = 1.0            # single-voxel dust (below min size)
    return img


# ---------------------------------------------------------------------------
# Numpy oracle implementing reference semantics.
# ---------------------------------------------------------------------------

class OracleCanvas:
    def __init__(self, image, opts):
        self.image = image
        self.shape = image.shape
        self.margin = np.array([FOV // 2] * 3)
        self.o = opts
        self.init_act = logit(opts.init_activation)
        self.pad = logit(opts.pad_value)
        self.move_t = logit(opts.move_threshold)
        self.seg_t = logit(opts.segment_threshold)
        self.disco = opts.disco_seed_threshold
        self.seed = np.full(self.shape, np.nan, np.float32)
        self.segmentation = np.zeros(self.shape, np.int32)
        self.max_id = 0

    def model_rule(self, img_patch):
        return np.where(img_patch > 0, 10.0, -10.0).astype(np.float32)

    def is_valid_pos(self, pos, ignore_threshold=False):
        if not ignore_threshold and not (
                self.seed[pos] >= self.move_t):  # NaN-safe
            return False
        p = np.array(pos)
        if np.any(p - self.margin < 0) or \
                np.any(p + self.margin >= self.shape):
            return False
        if self.segmentation[pos] > 0:
            return False
        return True

    def update_at(self, pos):
        start = np.array(pos) - FOV // 2
        sel = tuple(slice(s, s + FOV) for s in start)
        logits = self.model_rule(self.image[sel])
        if self.disco >= 0:
            old = self.seed[sel]
            if np.mean(logits >= self.move_t) > self.disco:
                with np.errstate(invalid="ignore"):
                    m = (old < 0.0) & (logits > old)
                logits[m] = old[m]
        self.seed[sel] = logits
        return logits

    def face_moves(self, prob_map):
        center = np.array(prob_map.shape) // 2
        sub = [slice(c - d, c + d + 1) for c, d in zip(center, DELTAS)]
        done = set()
        out = []
        for axis, d in enumerate(DELTAS):
            for off in (-d, d):
                fsel = sub[:]
                fsel[axis] = off + center[axis]
                face = prob_map[tuple(fsel)]
                fp = np.unravel_index(face.argmax(), face.shape)
                score = face[fp]
                if score < self.move_t:
                    continue
                rel = [fp[0] - face.shape[0] // 2, fp[1] - face.shape[1] // 2]
                rel.insert(axis, off)
                item = (score, tuple(rel))
                if item not in done:
                    done.add(item)
                    out.append(item)
        return sorted(out, reverse=True)

    def segment_at(self, start_pos):
        self.seed[...] = np.nan
        self.seed[start_pos] = self.init_act
        queue = deque()
        done_cells = set()

        def quantize(pos):
            rel = np.array(pos) - start_pos
            return tuple((rel + np.array(DELTAS) // 2)
                         // np.maximum(DELTAS, 1))

        num_iters = 0
        pos = start_pos
        while True:
            if not (self.seed[start_pos] >= self.move_t):
                break
            logits = self.update_at(pos)
            num_iters += 1
            done_cells.add(quantize(pos))
            for score, rel in self.face_moves(logits):
                queue.append((score, tuple(np.array(rel) + pos)))
            # pop next valid
            nxt = None
            while queue:
                _, cand = queue.popleft()
                if quantize(cand) in done_cells:
                    continue
                if self.is_valid_pos(cand):
                    nxt = cand
                    break
            if nxt is None:
                break
            pos = nxt
        return num_iters

    def segment_all(self, seeds):
        mbd = np.array([1, 1, 1])
        for pos in seeds:
            pos = tuple(pos)
            if not self.is_valid_pos(pos, ignore_threshold=True):
                continue
            low = np.array(pos) - mbd
            high = np.array(pos) + mbd + 1
            sel = tuple(slice(s, e) for s, e in zip(low, high))
            if np.any(self.segmentation[sel] > 0):
                self.segmentation[pos] = -1
                continue
            iters = self.segment_at(pos)
            if iters <= 0:
                continue
            if not (self.seed[pos] >= self.move_t):
                if self.segmentation[pos] == 0:
                    self.segmentation[pos] = -1
                continue
            with np.errstate(invalid="ignore"):
                mask = self.seed >= self.seg_t
            mask &= self.segmentation <= 0
            if mask.sum() < self.o.min_segment_size:
                if self.segmentation[pos] == 0:
                    self.segmentation[pos] = -1
                continue
            self.max_id += 1
            self.segmentation[mask] = self.max_id


class GridSeeds(seed_lib.BaseSeedPolicy):
    def init_coords(self):
        coords = []
        for z in range(4, self.canvas.shape[0] - 4, 4):
            for y in range(4, self.canvas.shape[1] - 4, 4):
                for x in range(4, self.canvas.shape[2] - 4, 4):
                    coords.append((z, y, x))
        self.coords = np.array(coords)


def grid_seed_list(shape):
    return [(z, y, x)
            for z in range(4, shape[0] - 4, 4)
            for y in range(4, shape[1] - 4, 4)
            for x in range(4, shape[2] - 4, 4)]


def test_canvas_matches_numpy_oracle():
    image = make_image()
    opts = make_options()

    # TPU-native canvas.
    model = oracle.ThresholdOracleModel(fov_size=[FOV] * 3,
                                        deltas=list(DELTAS))
    eng = engine_lib.FloodFillEngine(
        model, {}, pad_value=float(logit(opts.pad_value)),
        move_threshold=float(logit(opts.move_threshold)),
        disco_seed_threshold=opts.disco_seed_threshold)
    cv = canvas_lib.Canvas(model.info, eng, image, opts)
    cv.segment_all(seed_policy=GridSeeds)

    # Oracle.
    ora = OracleCanvas(image, opts)
    # The oracle's seed list must match what the policy yields after its
    # margin filter (margin = 4 here, grid starts at 4: all pass).
    ora.segment_all(grid_seed_list(image.shape))

    got = cv.segmentation.copy()
    want = ora.segmentation.copy()
    got[got < 0] = 0
    want[want < 0] = 0

    # Same voxels labeled, same object partition (ids may differ).
    np.testing.assert_array_equal(got > 0, want > 0)
    from ffn_tpu.inference import segmentation as seg_lib
    a = got.astype(np.uint32)
    b = want.astype(np.uint32)
    pairs = set(zip(a[a > 0].ravel().tolist(), b[a > 0].ravel().tolist()))
    # Bijection between ids.
    assert len({p[0] for p in pairs}) == len(pairs)
    assert len({p[1] for p in pairs}) == len(pairs)

    # Sanity: both objects found, dust rejected.
    ids = np.unique(got[got > 0])
    assert len(ids) == 2
    assert got[18, 6, 20] == 0


def test_canvas_checkpoint_roundtrip(tmp_path):
    image = make_image()
    opts = make_options()
    model = oracle.ThresholdOracleModel(fov_size=[FOV] * 3,
                                        deltas=list(DELTAS))
    eng = engine_lib.FloodFillEngine(
        model, {}, pad_value=float(logit(opts.pad_value)),
        move_threshold=float(logit(opts.move_threshold)),
        disco_seed_threshold=opts.disco_seed_threshold)

    cv = canvas_lib.Canvas(model.info, eng, image, opts)
    cv.segment_all(seed_policy=GridSeeds)
    ckpt = str(tmp_path / "canvas.cpoint")
    cv.save_checkpoint(ckpt, partial_segment_iters=0)

    cv2 = canvas_lib.Canvas(model.info, eng, image, opts)
    partial = cv2.restore_checkpoint(ckpt)
    assert partial == 0
    np.testing.assert_array_equal(cv2.segmentation, cv.segmentation)
    np.testing.assert_allclose(cv2.seed, cv.seed, equal_nan=True)
    assert cv2._max_id == cv._max_id
    assert set(cv2.origins) == set(cv.origins)
