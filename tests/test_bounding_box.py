import numpy as np
import pytest

from ffn_tpu.utils import bounding_box as bbox_lib
from ffn_tpu.proto import bounding_box_pb2


def test_construction_start_size():
    b = bbox_lib.BoundingBox(start=(1, 2, 3), size=(10, 20, 30))
    assert tuple(b.end) == (11, 22, 33)


def test_construction_start_end():
    b = bbox_lib.BoundingBox(start=(1, 2, 3), end=(11, 22, 33))
    assert tuple(b.size) == (10, 20, 30)


def test_construction_end_size():
    b = bbox_lib.BoundingBox(end=(11, 22, 33), size=(10, 20, 30))
    assert tuple(b.start) == (1, 2, 3)


def test_construction_requires_exactly_two():
    with pytest.raises(ValueError):
        bbox_lib.BoundingBox(start=(0, 0, 0))
    with pytest.raises(ValueError):
        bbox_lib.BoundingBox(start=(0, 0, 0), size=(1, 1, 1), end=(1, 1, 1))


def test_proto_roundtrip():
    b = bbox_lib.BoundingBox(start=(4, 5, 6), size=(7, 8, 9))
    proto = b.to_proto()
    assert isinstance(proto, bounding_box_pb2.BoundingBox)
    b2 = bbox_lib.BoundingBox(proto)
    assert b == b2


def test_adjusted_by():
    b = bbox_lib.BoundingBox(start=(10, 10, 10), size=(5, 5, 5))
    b2 = b.adjusted_by(start=(-1, -2, -3), end=(1, 2, 3))
    assert tuple(b2.start) == (9, 8, 7)
    assert tuple(b2.end) == (16, 17, 18)


def test_sub():
    b = bbox_lib.BoundingBox(start=(10, 10, 10), size=(20, 20, 20))
    s = b.Sub(start=(5, 5, 5), size=(3, 3, 3))
    assert tuple(s.start) == (15, 15, 15)
    assert tuple(s.size) == (3, 3, 3)


def test_to_slice_is_zyx():
    b = bbox_lib.BoundingBox(start=(1, 2, 3), size=(4, 5, 6))
    slc = b.to_slice()
    assert slc == np.index_exp[3:9, 2:7, 1:5]


def test_intersection():
    a = bbox_lib.BoundingBox(start=(0, 0, 0), size=(10, 10, 10))
    b = bbox_lib.BoundingBox(start=(5, 5, 5), size=(10, 10, 10))
    ix = bbox_lib.intersection(a, b)
    assert tuple(ix.start) == (5, 5, 5)
    assert tuple(ix.size) == (5, 5, 5)
    far = bbox_lib.BoundingBox(start=(100, 100, 100), size=(1, 1, 1))
    assert bbox_lib.intersection(a, far) is None


def test_containing():
    a = bbox_lib.BoundingBox(start=(0, 0, 0), size=(2, 2, 2))
    b = bbox_lib.BoundingBox(start=(5, 5, 5), size=(2, 2, 2))
    c = bbox_lib.containing(a, b)
    assert tuple(c.start) == (0, 0, 0)
    assert tuple(c.end) == (7, 7, 7)


class TestOrderlyOverlappingCalculator:
    def setup_method(self):
        self.outer = bbox_lib.BoundingBox(start=(0, 0, 0),
                                          size=(100, 100, 100))
        self.calc = bbox_lib.OrderlyOverlappingCalculator(
            self.outer, sub_box_size=(40, 40, 40), overlap=(10, 10, 10))

    def test_num_sub_boxes_matches_generator(self):
        gen = list(self.calc.generate_sub_boxes())
        assert len(gen) == self.calc.num_sub_boxes()

    def test_index_to_sub_box_fortran_order(self):
        # x changes fastest.
        b0 = self.calc.index_to_sub_box(0)
        b1 = self.calc.index_to_sub_box(1)
        assert tuple(b0.start) == (0, 0, 0)
        assert tuple(b1.start) == (30, 0, 0)
        assert b1.start[1] == b0.start[1] and b1.start[2] == b0.start[2]

    def test_generator_matches_indexing(self):
        gen = list(self.calc.generate_sub_boxes())
        idx = [self.calc.index_to_sub_box(i)
               for i in range(self.calc.num_sub_boxes())]
        assert gen == idx

    def test_coverage(self):
        # Every voxel of the outer box is covered by at least one sub-box.
        cover = np.zeros((100, 100, 100), dtype=bool)
        for b in self.calc.generate_sub_boxes():
            cover[b.to_slice()] = True
        assert cover.all()

    def test_overlap_between_neighbors(self):
        b0 = self.calc.index_to_sub_box(0)
        b1 = self.calc.index_to_sub_box(1)
        ix = bbox_lib.intersection(b0, b1)
        assert ix is not None
        assert ix.size[0] == 10

    def test_offset_to_index(self):
        n = self.calc.total_sub_boxes_xyz
        idx = self.calc.offset_to_index(0, (1, 0, 0))
        assert idx == 1
        idx = self.calc.offset_to_index(0, (0, 1, 0))
        assert idx == n[0]
        assert self.calc.offset_to_index(0, (-1, 0, 0)) is None

    def test_tag_border_locations(self):
        is_start, is_end = self.calc.tag_border_locations(0)
        assert is_start.all() and not is_end.any()
        last = self.calc.num_sub_boxes() - 1
        is_start, is_end = self.calc.tag_border_locations(last)
        assert is_end.all() and not is_start.any()

    def test_back_shift_small_sub_boxes(self):
        calc = bbox_lib.OrderlyOverlappingCalculator(
            self.outer, sub_box_size=(40, 40, 40), overlap=(10, 10, 10),
            back_shift_small_sub_boxes=True)
        for b in calc.generate_sub_boxes():
            assert tuple(b.size) == (40, 40, 40)
            assert np.all(b.end <= self.outer.end)
