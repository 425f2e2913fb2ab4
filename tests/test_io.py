import numpy as np

from ngravs_tpu.io.gadget_format import (SnapshotData, SnapshotHeader,
                                         read_snapshot, write_snapshot)

IC = "/root/reference/GalaxyCollision.IC"


def test_read_galaxy_collision():
    s = read_snapshot(IC, expect_format=1)
    assert list(s.header.npart) == [0, 10000, 20000, 10000, 10000, 10000]
    assert s.n == 60000
    assert s.pid.min() == 1 and s.pid.max() == 60000
    assert np.all(s.mass > 0)
    # disk particles lighter than halo
    assert s.mass[s.ptype == 2].max() < s.mass[s.ptype == 1].min()
    assert np.isfinite(s.pos).all() and np.isfinite(s.vel).all()


def _random_snapshot(rng, npart, fmt_mass_in_header=False):
    n = sum(npart)
    h = SnapshotHeader()
    h.npart = np.array(npart, np.int32)
    h.npart_total = np.array(npart, np.uint32)
    h.time = 0.25
    if fmt_mass_in_header:
        h.mass = np.array([0.1 * (t + 1) if npart[t] else 0 for t in range(6)])
    mass = np.repeat([0.1 * (t + 1) for t in range(6)], npart).astype(np.float32)
    ngas = npart[0]
    return SnapshotData(
        header=h,
        pos=rng.uniform(0, 100, (n, 3)).astype(np.float32),
        vel=rng.normal(0, 10, (n, 3)).astype(np.float32),
        pid=np.arange(1, n + 1, dtype=np.uint32),
        mass=mass,
        ptype=np.repeat(np.arange(6, dtype=np.int32), npart),
        u=rng.uniform(1, 2, ngas).astype(np.float32) if ngas else None,
        rho=np.zeros(ngas, np.float32) if ngas else None,
        hsml=np.ones(ngas, np.float32) if ngas else None,
    )


def test_roundtrip_format1(tmp_path, rng):
    data = _random_snapshot(rng, [50, 100, 0, 30, 0, 20])
    path = str(tmp_path / "snap_000")
    write_snapshot(path, data, snap_format=1)
    back = read_snapshot(path, expect_format=1)
    np.testing.assert_array_equal(back.header.npart, data.header.npart)
    np.testing.assert_allclose(back.pos, data.pos)
    np.testing.assert_allclose(back.vel, data.vel)
    np.testing.assert_array_equal(back.pid, data.pid)
    np.testing.assert_allclose(back.mass, data.mass)
    np.testing.assert_allclose(back.u, data.u)
    assert back.header.time == data.header.time


def test_roundtrip_format2(tmp_path, rng):
    data = _random_snapshot(rng, [0, 64, 32, 0, 0, 0])
    path = str(tmp_path / "snap_001")
    write_snapshot(path, data, snap_format=2)
    back = read_snapshot(path, expect_format=2)
    np.testing.assert_allclose(back.pos, data.pos)
    np.testing.assert_allclose(back.mass, data.mass)


def test_header_mass_table_elision(tmp_path, rng):
    data = _random_snapshot(rng, [0, 10, 0, 0, 0, 0], fmt_mass_in_header=True)
    path = str(tmp_path / "snap_002")
    write_snapshot(path, data, snap_format=1)
    back = read_snapshot(path)
    np.testing.assert_allclose(back.mass, data.mass, rtol=1e-6)
