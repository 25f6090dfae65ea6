"""Pod-scale sharded inference: subvolume decomposition + seed handoff.

The reference recommends an external task queue for distributing
subvolumes (doc/manual.md:107-117) and ships only the decomposition
geometry. This driver provides the whole pipeline in-framework:

  - subvolumes from an OrderlyOverlappingCalculator, assigned to workers
    by linear index (idempotent: finished subvolumes are skipped, so
    retries and elastic workers are safe);
  - optional seed handoff: seeds derived from the origins of already-
    finished neighboring subvolumes are tried first, so objects crossing
    subvolume borders get consistent flood fills;
  - overlap stitching into a global ID space (ffn_tpu.parallel.stitching).

Workers are processes/hosts; each drives its own TPU chip(s) through a
Runner. Within a worker, the batched lanes of BatchCanvas provide the
chip-level parallelism.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

from absl import logging
import numpy as np

from ffn_tpu.inference import runner as runner_lib
from ffn_tpu.inference import seed as seed_lib
from ffn_tpu.inference import storage
from ffn_tpu.utils import bounding_box


class PolicyNeighborOriginsThenPeaks(seed_lib.BaseSeedPolicy):
    """Seed handoff policy: origins inherited from finished neighbor
    subvolumes (translated into local coordinates) are visited before the
    standard PolicyPeaks seeds."""

    def __init__(self, canvas, corner=None, subvol_size=None,
                 segmentation_dir=None, neighbor_corners=(), **kwargs):
        super().__init__(canvas, **kwargs)
        self._corner = np.asarray(corner)          # zyx
        self._size = np.asarray(subvol_size)
        self._segmentation_dir = segmentation_dir
        self._neighbor_corners = [np.asarray(c) for c in neighbor_corners]
        self._peaks = seed_lib.PolicyPeaks(canvas)

    def init_coords(self):
        handoff = []
        for nbr_corner in self._neighbor_corners:
            try:
                origins = storage.load_origins(self._segmentation_dir,
                                               tuple(nbr_corner))
            except ValueError:
                continue
            for info in origins.values():
                local = np.asarray(info.start_zyx) + nbr_corner \
                    - self._corner
                if np.all(local >= 0) and np.all(local < self._size):
                    handoff.append(local)
        self._peaks.init_coords()
        peak_coords = self._peaks.coords
        if peak_coords is None:
            peak_coords = np.zeros((0, 3), np.int64)
        self.num_handoff = len(handoff)   # observability (dryrun/tests)
        if handoff:
            self.coords = np.concatenate(
                [np.array(handoff, np.int64), peak_coords])
        else:
            self.coords = peak_coords


# Make the policy resolvable by name through Runner.get_seed_policy
# (which looks it up on the seed module).
seed_lib.PolicyNeighborOriginsThenPeaks = PolicyNeighborOriginsThenPeaks


class ShardedInferenceDriver:
    """Runs (a shard of) a decomposed whole-volume inference."""

    def __init__(self, request, outer_box: bounding_box.BoundingBox,
                 subvol_size_xyz: Sequence[int],
                 overlap_xyz: Sequence[int],
                 seed_handoff: bool = True):
        self.request = request
        self.calc = bounding_box.OrderlyOverlappingCalculator(
            outer_box, list(subvol_size_xyz), list(overlap_xyz))
        self.seed_handoff = seed_handoff

    def num_subvolumes(self) -> int:
        return self.calc.num_sub_boxes()

    def pending_indices(self) -> list[int]:
        """Indices whose output npz does not exist yet."""
        out = []
        for index in range(self.calc.num_sub_boxes()):
            box = self.calc.index_to_sub_box(index)
            corner = tuple(int(v) for v in box.start[::-1])
            if not storage.get_existing_subvolume_path(
                    self.request.segmentation_output_dir, corner):
                out.append(index)
        return out

    def _neighbor_corners(self, index) -> list[tuple]:
        corners = []
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    nbr = self.calc.offset_to_index(index, (dx, dy, dz))
                    if nbr is None:
                        continue
                    box = self.calc.index_to_sub_box(nbr)
                    corners.append(tuple(int(v) for v in box.start[::-1]))
        return corners

    def run_worker(self, worker_id: int = 0, num_workers: int = 1,
                   runner: Optional[runner_lib.Runner] = None):
        """Processes every subvolume with index % num_workers == worker_id."""
        if runner is None:
            runner = runner_lib.Runner()
            runner.start(self.request)

        processed = 0
        for index in range(self.calc.num_sub_boxes()):
            if index % num_workers != worker_id:
                continue
            box = self.calc.index_to_sub_box(index)
            corner = tuple(int(v) for v in box.start[::-1])
            size = tuple(int(v) for v in box.size[::-1])

            if self.seed_handoff:
                self._install_handoff_policy(runner, index)
            result = runner.run(corner, size)
            if result is not None:
                processed += 1
            logging.info("worker %d: subvolume %d/%d done", worker_id,
                         index, self.calc.num_sub_boxes())
        return processed

    def run_worker_fused(self, worker_id: int = 0, num_workers: int = 1,
                         runner: Optional[runner_lib.Runner] = None,
                         lanes: int = 64, slots: int = 4, hops: int = 16,
                         keep_probability_maps: bool = False,
                         device_finalize: bool = True,
                         mesh=None) -> int:
        """Processes this worker's subvolumes CONCURRENTLY in one engine
        batch (parallel.multi_canvas): lanes starved by one subvolume's
        seed supply refill from another, so the conv batch stays full on
        object-sparse volumes. Outputs and idempotency semantics are
        identical to run_worker. Returns the number of subvolumes saved.
        """
        import functools

        from ffn_tpu.parallel import multi_canvas

        if runner is None:
            runner = runner_lib.Runner()
            runner.start(self.request)

        tasks = []
        corner_to_index = {}
        for index in range(self.calc.num_sub_boxes()):
            if index % num_workers != worker_id:
                continue
            box = self.calc.index_to_sub_box(index)
            corner = tuple(int(v) for v in box.start[::-1])
            size = tuple(int(v) for v in box.size[::-1])
            tasks.append((corner, size))
            corner_to_index[corner] = index
        if not tasks:
            return 0

        if self.seed_handoff:
            # Per-slot handoff policies (run_worker's request mutation
            # can't serve concurrent slots): neighbors that finished —
            # in this run or a previous one — donate their origins.
            def get_seed_policy(corner, subvol_size):
                kwargs = (json.loads(runner.request.seed_policy_args)
                          if runner.request.seed_policy_args else {})
                kwargs["segmentation_dir"] = \
                    runner.request.segmentation_output_dir
                kwargs["neighbor_corners"] = self._neighbor_corners(
                    corner_to_index[tuple(int(v) for v in corner)])
                return functools.partial(
                    seed_lib.PolicyNeighborOriginsThenPeaks,
                    corner=corner, subvol_size=subvol_size, **kwargs)

            runner.get_seed_policy = get_seed_policy

        driver = multi_canvas.MultiSubvolumeHopDriver(
            runner, tasks, lanes=lanes, slots=slots, hops=hops,
            keep_probability_maps=keep_probability_maps,
            device_finalize=device_finalize, mesh=mesh)
        return driver.run()

    def _install_handoff_policy(self, runner, index):
        neighbor_corners = self._neighbor_corners(index)
        args = (json.loads(runner.request.seed_policy_args)
                if runner.request.seed_policy_args else {})
        args["segmentation_dir"] = \
            runner.request.segmentation_output_dir
        args["neighbor_corners"] = [list(map(int, c))
                                    for c in neighbor_corners]
        runner.request.seed_policy = "PolicyNeighborOriginsThenPeaks"
        runner.request.seed_policy_args = json.dumps(args)

    def stitch(self, min_overlap_fraction: float = 0.5):
        """Builds the global ID space over all finished subvolumes."""
        from ffn_tpu.parallel import stitching
        return stitching.SubvolumeStitcher(
            self.calc, self.request.segmentation_output_dir,
            min_overlap_fraction).build()
