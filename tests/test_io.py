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


def _demo_snapshot():
    from ngravs_tpu.io.gadget_format import SnapshotData, SnapshotHeader
    h = SnapshotHeader()
    h.npart = np.array([4, 10, 0, 6, 0, 0], np.int32)
    h.mass = np.array([0, 2.0, 0, 0, 0, 0])
    h.npart_total = h.npart.astype(np.uint32)
    n = int(h.npart.sum())
    rng = np.random.default_rng(0)
    ptype = np.repeat(np.arange(6, dtype=np.int32), h.npart)
    return SnapshotData(
        header=h, pos=rng.random((n, 3)).astype(np.float32),
        vel=rng.random((n, 3)).astype(np.float32),
        pid=np.arange(n, dtype=np.uint32),
        mass=np.where(ptype == 1, 2.0, rng.random(n)).astype(np.float32),
        ptype=ptype,
        u=rng.random(4).astype(np.float32),
        rho=rng.random(4).astype(np.float32),
        hsml=rng.random(4).astype(np.float32))


def test_hdf5_round_trip(tmp_path):
    """Format 3 (io.c:998-1120): header attrs, per-type groups, MassTable
    elision, gas blocks."""
    from ngravs_tpu.io.gadget_format import (read_snapshot_hdf5,
                                             write_snapshot_hdf5)
    d = _demo_snapshot()
    path = str(tmp_path / "snap.hdf5")
    write_snapshot_hdf5(path, d)
    r = read_snapshot_hdf5(path)
    np.testing.assert_allclose(r.pos, d.pos)
    np.testing.assert_allclose(r.mass, d.mass)
    np.testing.assert_allclose(r.u, d.u)
    assert (r.header.npart == d.header.npart).all()
    import h5py
    with h5py.File(path) as f:  # type-1 masses elided into MassTable
        assert "Masses" not in f["PartType1"]


def test_multifile_round_trip(tmp_path):
    """Multi-file snapshots (io.c:94-112 write groups; read_ic.c:615
    find_files): split across 3 files, recombine, per-type content equal."""
    from ngravs_tpu.io.gadget_format import (read_snapshot_set,
                                             write_snapshot_multi)
    d = _demo_snapshot()
    base = str(tmp_path / "snap")
    write_snapshot_multi(base, d, 3, snap_format=1)
    r = read_snapshot_set(base)
    assert sorted(r.pid.tolist()) == sorted(d.pid.tolist())
    assert (r.header.npart == d.header.npart).all()
    for t in range(6):
        a = np.sort(d.pos[d.ptype == t], axis=0)
        b = np.sort(r.pos[r.ptype == t], axis=0)
        np.testing.assert_allclose(a, b)
    # hdf5 multi-file
    base2 = str(tmp_path / "snap_h5")
    write_snapshot_multi(base2, d, 2, snap_format=3)
    r2 = read_snapshot_set(base2)
    assert sorted(r2.pid.tolist()) == sorted(d.pid.tolist())


def test_init_gas_temp_applied(tmp_path):
    """Gas read with u == 0 starts at InitGasTemp (read_ic.c:114-143)."""
    import jax.numpy as jnp
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.integrate.runner import Simulation
    from ngravs_tpu.io.gadget_format import (SnapshotData, SnapshotHeader,
                                             write_snapshot)
    n = 32
    rng = np.random.default_rng(0)
    h = SnapshotHeader()
    h.npart = np.array([n, 0, 0, 0, 0, 0], np.int32)
    h.npart_total = h.npart.astype(np.uint32)
    data = SnapshotData(
        header=h, pos=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        vel=np.zeros((n, 3), np.float32), pid=np.arange(n, dtype=np.uint32),
        mass=np.full(n, 0.1, np.float32),
        ptype=np.zeros(n, np.int32), u=np.zeros(n, np.float32))
    path = str(tmp_path / "ic_gas")
    write_snapshot(path, data)
    cfg = SimulationConfig(
        init_cond_file=path, time_begin=0.0, time_max=1.0,
        gravity_constant_internal=1.0, softening=(0.05,) * 6,
        init_gas_temp=1000.0, time_bet_snapshot=0.0,
        time_of_first_snapshot=1e30, time_bet_statistics=0.0,
        wiring="newton")
    sim = Simulation(cfg, log_dir="")
    u0 = np.asarray(sim.sph.entropy[:n])
    assert (u0 > 0).all()
    # kB T / ((gamma-1) mu mp) in internal units (UnitVelocity=1e5 cm/s)
    assert 1e-3 < u0[0] < 1e3


def test_optional_blocks_round_trip(tmp_path):
    """POT/ACCE/ENDT/TSTP blocks (OUTPUTPOTENTIAL/OUTPUTACCELERATION/
    OUTPUTCHANGEOFENTROPY/OUTPUTTIMESTEP, io.c:300-353) in formats 1-3."""
    rng = np.random.default_rng(3)
    d = _random_snapshot(rng, [4, 8, 0, 0, 0, 0])
    n, ngas = d.n, 4
    d.pot = rng.normal(-5, 1, n).astype(np.float32)
    d.accel = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d.dtentr = rng.normal(0, 0.1, ngas).astype(np.float32)
    d.tstp = rng.uniform(0, 0.01, n).astype(np.float32)
    for fmt in (1, 2):
        p = str(tmp_path / f"snap_f{fmt}")
        write_snapshot(p, d, snap_format=fmt)
        r = read_snapshot(p)
        np.testing.assert_array_equal(r.pot, d.pot)
        np.testing.assert_array_equal(r.accel, d.accel)
        np.testing.assert_array_equal(r.dtentr, d.dtentr)
        np.testing.assert_array_equal(r.tstp, d.tstp)
    from ngravs_tpu.io.gadget_format import (read_snapshot_hdf5,
                                             write_snapshot_hdf5)
    p3 = str(tmp_path / "snap_f3.hdf5")
    write_snapshot_hdf5(p3, d)
    r = read_snapshot_hdf5(p3)
    np.testing.assert_array_equal(r.pot, d.pot)
    np.testing.assert_array_equal(r.accel, d.accel)
    np.testing.assert_array_equal(r.dtentr, d.dtentr)
    np.testing.assert_array_equal(r.tstp, d.tstp)


def test_optional_blocks_skip_absent(tmp_path):
    """A format-1 file with ACCE but no POT must not mislabel ACCE as POT
    (size-based skipping of absent optional blocks)."""
    rng = np.random.default_rng(4)
    d = _random_snapshot(rng, [0, 6, 0, 0, 0, 0])
    d.accel = rng.normal(0, 1, (d.n, 3)).astype(np.float32)
    d.tstp = rng.uniform(0, 0.01, d.n).astype(np.float32)
    p = str(tmp_path / "snap_noPot")
    write_snapshot(p, d)
    r = read_snapshot(p)
    assert r.pot is None
    np.testing.assert_array_equal(r.accel, d.accel)
    np.testing.assert_array_equal(r.tstp, d.tstp)


def test_longids_round_trip(tmp_path):
    """-DLONGIDS: 64-bit ID blocks, auto-detected on read by record size."""
    rng = np.random.default_rng(5)
    d = _random_snapshot(rng, [0, 5, 0, 0, 0, 0])
    d.pid = (np.arange(5, dtype=np.uint64) + (1 << 40))
    for fmt in (1, 2):
        p = str(tmp_path / f"snap_long_f{fmt}")
        write_snapshot(p, d, snap_format=fmt, longids=True)
        r = read_snapshot(p)
        assert r.pid.dtype == np.uint64
        np.testing.assert_array_equal(r.pid, d.pid)
    from ngravs_tpu.io.gadget_format import (read_snapshot_hdf5,
                                             write_snapshot_hdf5)
    p3 = str(tmp_path / "snap_long.hdf5")
    write_snapshot_hdf5(p3, d, longids=True)
    r = read_snapshot_hdf5(p3)
    assert r.pid.dtype == np.uint64
    np.testing.assert_array_equal(r.pid, d.pid)


def test_runner_output_blocks(tmp_path):
    """End to end: OutputAcceleration/OutputTimestep/OutputChangeOfEntropy
    produce snapshot blocks, and the U block holds internal energy converted
    back from entropy (io.c:266-279), not the raw entropy variable."""
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.constants import GAMMA_MINUS1
    from ngravs_tpu.integrate.runner import Simulation
    n = 32
    rng = np.random.default_rng(7)
    h = SnapshotHeader()
    h.npart = np.array([n, 0, 0, 0, 0, 0], np.int32)
    h.npart_total = h.npart.astype(np.uint32)
    data = SnapshotData(
        header=h, pos=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        vel=np.zeros((n, 3), np.float32), pid=np.arange(n, dtype=np.uint32),
        mass=np.full(n, 0.1, np.float32),
        ptype=np.zeros(n, np.int32),
        u=np.full(n, 2.0, np.float32))
    ic = str(tmp_path / "ic_blocks")
    write_snapshot(ic, data)
    cfg = SimulationConfig(
        init_cond_file=ic, time_begin=0.0, time_max=1.0,
        gravity_constant_internal=1.0, softening=(0.05,) * 6,
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
        time_bet_statistics=0.0, max_size_timestep=0.01,
        output_acceleration=True, output_timestep=True,
        output_change_of_entropy=True, wiring="newton")
    sim = Simulation(cfg, log_dir="")
    sim.run(max_steps=3)
    out = str(tmp_path / "snap_out")
    sim.write_snapshot_now(out)
    r = read_snapshot(out)
    assert r.accel is not None and np.isfinite(r.accel).all()
    assert (np.abs(r.accel) > 0).any()
    assert r.tstp is not None and (r.tstp > 0).all()
    assert r.dtentr is not None
    # U must equal S/(gamma-1)*rho^(gamma-1), not S itself
    import jax
    ent, rho = [np.asarray(x)[:n] for x in
                jax.device_get((sim.sph.entropy, sim.sph.density))]
    expect_u = ent / GAMMA_MINUS1 * np.maximum(rho, 1e-37) ** GAMMA_MINUS1
    np.testing.assert_allclose(r.u, np.maximum(
        expect_u, sim.units.min_egy_spec), rtol=2e-5)
