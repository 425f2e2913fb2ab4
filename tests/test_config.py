import numpy as np
import pytest

from ngravs_tpu.config import SimulationConfig, read_parameter_file
from ngravs_tpu.units import set_units

REF_PARAM = "/root/reference/Configuration.reference"


def test_parse_reference_parameterfile():
    cfg = read_parameter_file(REF_PARAM)
    assert cfg.init_cond_file == "GalaxyCollision.IC"
    assert cfg.time_begin == 0.0 and cfg.time_max == 2.0
    assert cfg.err_tol_theta == 0.5
    assert cfg.err_tol_force_acc == 0.005
    assert cfg.err_tol_int_accuracy == 0.025
    assert cfg.time_bet_snapshot == 0.01
    assert not cfg.comoving_integration and not cfg.periodic
    # ngravs bindings: disk (type 2) -> gravity 1, rest -> 0
    assert cfg.type_to_grav == (0, 0, 1, 0, 0, 0)
    assert cfg.n_gravs == 2
    assert cfg.softening == (0.0, 1.0, 0.4, 1.0, 1.0, 1.0)
    assert cfg.unit_length_in_cm == 3.085678e21


def test_units_galaxy_collision():
    cfg = read_parameter_file(REF_PARAM)
    u = set_units(cfg)
    # kpc / 1e10 Msun / km/s units: G = 43007.1 in Gadget's convention
    assert np.isclose(u.G, 43007.1, rtol=1e-4)
    assert np.isclose(u.hubble, 0.1, rtol=1e-3)


def test_invalid_tag_raises(tmp_path):
    p = tmp_path / "bad.param"
    p.write_text("NotATag 17\n")
    with pytest.raises(ValueError):
        read_parameter_file(str(p))


def test_pm_requires_periodic():
    with pytest.raises(ValueError):
        SimulationConfig(pmgrid=128, periodic=False)


def test_gas_gravity0_under_pm():
    with pytest.raises(ValueError):
        SimulationConfig(pmgrid=128, periodic=True, box_size=1.0,
                         n_gravs=2, type_to_grav=(1, 0, 0, 0, 0, 0))
