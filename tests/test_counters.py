import numpy as np

from ffn_tpu.inference import counters as counters_lib


def test_counter_basics():
    c = counters_lib.Counters()
    c["a"].Increment()
    c["a"].IncrementBy(4)
    assert c["a"].value == 5
    c["a"].Reset()
    assert c["a"].value == 0


def test_parent_propagation():
    parent = counters_lib.Counters()
    child = parent.get_sub_counters()
    child["x"].IncrementBy(3)
    assert parent["x"].value == 3
    child2 = parent.get_sub_counters()
    child2["x"].IncrementBy(2)
    assert parent["x"].value == 5
    assert child["x"].value == 3


def test_timer_counter():
    c = counters_lib.Counters()
    with counters_lib.timer_counter(c, "op"):
        pass
    assert c["op-calls"].value == 1
    assert c["op-time-ms"].value >= 0


def test_dumps_loads_roundtrip():
    c = counters_lib.Counters()
    c["foo"].IncrementBy(7)
    c["bar"].IncrementBy(11)
    blob = c.dumps()
    c2 = counters_lib.Counters()
    c2.loads(blob)
    assert c2["foo"].value == 7
    assert c2["bar"].value == 11


def test_dump_file(tmp_path):
    c = counters_lib.Counters()
    c["n"].IncrementBy(2)
    path = tmp_path / "counters.txt"
    c.dump(str(path))
    assert "n: 2" in path.read_text()


def test_timed_iter():
    c = counters_lib.Counters()
    out = list(counters_lib.TimedIter(range(3), c, "it"))
    assert out == [0, 1, 2]
    assert c["it-calls"].value == 4  # 3 items + StopIteration


def test_histogram_lut_identity():
    hist = np.bincount(np.arange(256), minlength=256)
    lut = counters_lib.compute_histogram_lut(hist, hist)
    # Identity-ish mapping (within quantization slack).
    assert np.abs(lut.astype(int) - np.arange(256)).max() <= 1
