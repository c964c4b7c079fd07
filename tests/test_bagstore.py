"""Native bag-store tests: build, write/read round trip, sampling, threading."""

import numpy as np
import pytest

from transmil_deepgraft_tpu.data.bagstore import BagStore, convert_h5_dir, write_bagstore


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bs")
    rng = np.random.default_rng(0)
    bags = [rng.standard_normal((n, 16)).astype(np.float32) for n in (10, 200, 5)]
    coords = [rng.integers(0, 100, (b.shape[0], 2)).astype(np.int32) for b in bags]
    path = write_bagstore(tmp / "cohort.bags", bags, coords)
    return BagStore(path), bags, coords


def test_roundtrip(store):
    bs, bags, coords = store
    assert bs.n_slides == 3 and bs.dim == 16
    for i, bag in enumerate(bags):
        assert bs.n_tiles(i) == bag.shape[0]
        np.testing.assert_array_equal(bs.read_bag(i), bag)
        np.testing.assert_array_equal(bs.read_coords(i), coords[i])


def test_sample_no_replacement(store):
    bs, bags, _ = store
    out, taken = bs.sample_bag(1, 50, seed=7)
    assert taken == 50 and out.shape == (50, 16)
    # every sampled row must exist in the source bag, all distinct
    src = {row.tobytes() for row in bags[1]}
    sampled = [row.tobytes() for row in out]
    assert all(r in src for r in sampled)
    assert len(set(sampled)) == 50


def test_sample_pads_small_bag(store):
    bs, bags, _ = store
    out, taken = bs.sample_bag(2, 8, seed=1)
    assert taken == 5
    assert np.all(out[5:] == 0)


def test_sample_deterministic(store):
    bs, _, _ = store
    a, _ = bs.sample_bag(1, 20, seed=42)
    b, _ = bs.sample_bag(1, 20, seed=42)
    c, _ = bs.sample_bag(1, 20, seed=43)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_assemble_batch_threaded(store):
    bs, bags, _ = store
    batch = bs.assemble_batch([0, 1, 2, 1], k=32, seed=9, n_threads=4)
    assert batch.shape == (4, 32, 16)
    # slide 0 has 10 tiles -> rows 10: padded zeros
    assert np.all(batch[0, 10:] == 0)
    # rows of slide 1 samples come from slide 1
    src = {row.tobytes() for row in bags[1]}
    assert all(r.tobytes() in src for r in batch[1])


def test_convert_h5_dir(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    for i in range(2):
        with h5py.File(tmp_path / f"s{i}.h5", "w") as f:
            f["features"] = rng.standard_normal((7 + i, 4)).astype(np.float32)
            f["coords"] = rng.integers(0, 9, (7 + i, 2)).astype(np.int32)
    path, names = convert_h5_dir(tmp_path, tmp_path / "out.bags")
    bs = BagStore(path)
    assert bs.n_slides == 2 and names == ["s0", "s1"]
    assert bs.n_tiles(1) == 8


def test_bagstore_rejects_corrupt_and_missing_files(tmp_path):
    """Bad stores surface as clean IOErrors, not segfaults or garbage reads."""
    import pytest

    from transmil_deepgraft_tpu.data.bagstore import BagStore, write_bagstore

    with pytest.raises(IOError):
        BagStore(tmp_path / "nope.bagstore")

    # truncated store: header parses short / magic mismatch -> clean failure
    path = write_bagstore(
        tmp_path / "ok.bagstore",
        [np.arange(20, dtype=np.float32).reshape(5, 4)],
    )
    data = path.read_bytes()
    trunc = tmp_path / "trunc.bagstore"
    trunc.write_bytes(data[: max(8, len(data) // 3)])
    with pytest.raises((IOError, RuntimeError, IndexError)):
        st = BagStore(trunc)
        st.read_bag(0)

    garbage = tmp_path / "garbage.bagstore"
    garbage.write_bytes(b"\x00" * 64)
    with pytest.raises((IOError, RuntimeError, IndexError)):
        st = BagStore(garbage)
        st.read_bag(0)
