import numpy as np

from ffn_tpu.inference import segmentation


def test_make_contiguous():
    seg = np.array([[0, 5, 5], [9, 0, 5], [100, 9, 0]])
    out, mapping = segmentation.make_contiguous(seg)
    assert dict(mapping) == {5: 1, 9: 2, 100: 3}
    assert out[0, 1] == 1 and out[1, 0] == 2 and out[2, 0] == 3
    assert out[0, 0] == 0


def test_relabel():
    seg = np.array([0, 1, 2, 3, 2])
    out = segmentation.relabel(seg, np.array([1, 2]), np.array([10, 20]))
    np.testing.assert_array_equal(out, [0, 10, 20, 0, 20])


def test_split_disconnected_components():
    seg = np.zeros((10, 10, 10), dtype=np.int32)
    seg[0:2, 0:2, 0:2] = 7
    seg[5:7, 5:7, 5:7] = 7  # same id, disconnected
    out = segmentation.split_disconnected_components(seg)
    ids = np.unique(out[out > 0])
    assert len(ids) == 2
    # Each component keeps one uniform id.
    assert len(np.unique(out[0:2, 0:2, 0:2])) == 1
    assert len(np.unique(out[5:7, 5:7, 5:7])) == 1


def test_split_uses_6_connectivity():
    seg = np.zeros((3, 3, 3), dtype=np.int32)
    seg[0, 0, 0] = 1
    seg[1, 1, 1] = 1  # diagonal: not 6-connected
    out = segmentation.split_disconnected_components(seg)
    assert out[0, 0, 0] != out[1, 1, 1]


def test_clear_dust():
    seg = np.zeros((5, 5, 5), dtype=np.int32)
    seg[0, 0, 0:2] = 1
    seg[2:5, 2:5, 2:5] = 2
    segmentation.clear_dust(seg, min_size=5)
    assert (seg == 1).sum() == 0
    assert (seg == 2).sum() == 27


def test_reduce_id_bits():
    seg = np.array([0, 200], dtype=np.int64)
    assert segmentation.reduce_id_bits(seg).dtype == np.uint8
    seg = np.array([0, 70000], dtype=np.int64)
    assert segmentation.reduce_id_bits(seg).dtype == np.uint32
    seg = np.array([0, 1 << 40], dtype=np.int64)
    assert segmentation.reduce_id_bits(seg).dtype == np.uint64


def test_clean_up_id_map():
    seg = np.zeros((10, 10, 10), dtype=np.uint64)
    seg[0:3, 0:3, 0:3] = 42
    seg[6:9, 6:9, 6:9] = 42
    new_to_old = segmentation.clean_up(seg, split_cc=True, min_size=0,
                                       return_id_map=True)
    assert set(new_to_old.values()) == {42}
    assert len(new_to_old) == 2


def test_split_segmentation_by_intersection():
    a = np.zeros((4, 4, 4), dtype=np.uint32)
    b = np.zeros((4, 4, 4), dtype=np.uint32)
    a[0:4, :, :] = 1          # a: one big object
    b[0:2, :, :] = 1          # b: two objects splitting a
    b[2:4, :, :] = 2
    segmentation.split_segmentation_by_intersection(a, b)
    ids = np.unique(a)
    ids = ids[ids > 0]
    assert len(ids) == 2
    # Pair (1,1) and (1,2) get distinct labels.
    assert len(np.unique(a[0:2])) == 1
    assert len(np.unique(a[2:4])) == 1
    assert a[0, 0, 0] != a[3, 0, 0]


def test_split_segmentation_zeroes_nonoverlap():
    a = np.ones((2, 2, 2), dtype=np.uint32)
    b = np.zeros((2, 2, 2), dtype=np.uint32)
    b[0] = 3
    segmentation.split_segmentation_by_intersection(a, b)
    assert (a[1] == 0).all()
    assert (a[0] > 0).all()
