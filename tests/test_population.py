"""Population config ingestion (gwkit.data.population, VERDICT r3 #4).

The reference expresses injection populations as pycbc_create_injections
ini files (`MLGWSC-1/generate_data.py:772-790` runs
``pycbc_create_injections --config ds{N}.ini``); these tests pin gwkit's
reader on the challenge field names and round-trip a custom population
through the generate-data CLI.
"""
import json

import h5py
import numpy as np
import pytest

from gwkit.data.population import load_population, normalize_approximant
from gwkit.data.waveforms import SourceDistribution

# ds2-style ini with the "masses U(5,20)" edit the verdict uses as the
# acceptance example, in the challenge's pycbc_create_injections layout
DS2_LIKE_INI = """\
[variable_params]
mass1 =
mass2 =
spin1z =
spin2z =
ra =
dec =
coa_phase =
inclination =
chirp_distance =

[static_params]
approximant = IMRPhenomD
f_lower = 18

[prior-mass1]
name = uniform
min-mass1 = 5.0
max-mass1 = 20.0

[prior-mass2]
name = uniform
min-mass2 = 5.0
max-mass2 = 20.0

[prior-spin1z]
name = uniform
min-spin1z = -0.8
max-spin1z = 0.8

[prior-spin2z]
name = uniform
min-spin2z = -0.8
max-spin2z = 0.8

[prior-chirp_distance]
name = uniform
min-chirp_distance = 100.0
max-chirp_distance = 300.0

[prior-coa_phase]
name = uniform_angle

[prior-inclination]
name = sin_angle

[prior-ra+dec]
name = uniform_sky
"""

DS3_LIKE_INI = """\
[static_params]
approximant = IMRPhenomXPHM
f_lower = 20

[prior-mass1]
name = uniform
min-mass1 = 7.0
max-mass1 = 50.0

[prior-mass2]
name = uniform
min-mass2 = 7.0
max-mass2 = 50.0

[prior-spin1_a]
name = uniform
min-spin1_a = 0.0
max-spin1_a = 0.99

[prior-spin1_polar+spin1_azimuthal]
name = uniform_solidangle

[prior-spin2_a]
name = uniform
min-spin2_a = 0.0
max-spin2_a = 0.99

[prior-spin2_polar+spin2_azimuthal]
name = uniform_solidangle

[prior-chirp_distance]
name = uniform
min-chirp_distance = 130.0
max-chirp_distance = 350.0
"""


def test_ini_aligned_population(tmp_path):
    p = tmp_path / "ds2_custom.ini"
    p.write_text(DS2_LIKE_INI)
    dist = load_population(str(p))
    assert dist == SourceDistribution(
        mass_min=5.0, mass_max=20.0, chirp_distance_range=(100.0, 300.0),
        f_lower=18.0, spin_max=0.8, isotropic_spins=False,
        approximant="imrphenomd")


def test_ini_isotropic_population(tmp_path):
    p = tmp_path / "ds3_like.ini"
    p.write_text(DS3_LIKE_INI)
    dist = load_population(str(p))
    assert dist.spin_max == 0.99 and dist.isotropic_spins
    assert dist.approximant == "imrphenomxphm"
    assert (dist.mass_min, dist.mass_max) == (7.0, 50.0)
    # sampling respects the config bounds
    params = dist.sample(np.random.default_rng(0), 256)
    assert params["mass1"].min() >= 7.0 and params["mass1"].max() <= 50.0
    assert np.all(params["spin1z"] ** 2 <= 0.99 ** 2)


def test_json_population(tmp_path):
    p = tmp_path / "pop.json"
    p.write_text(json.dumps({
        "mass_min": 5.0, "mass_max": 20.0, "spin_max": 0.5,
        "approximant": "IMRPhenomPv2",
        "chirp_distance_range": [50.0, 150.0],
    }))
    dist = load_population(str(p))
    assert dist.mass_min == 5.0 and dist.approximant == "imrphenomp"
    assert dist.chirp_distance_range == (50.0, 150.0)


def test_population_error_paths(tmp_path):
    bad = tmp_path / "pop.json"
    bad.write_text(json.dumps({"mass_minimum": 5.0}))
    with pytest.raises(ValueError, match="mass_minimum"):
        load_population(str(bad))
    with pytest.raises(ValueError, match="unsupported approximant"):
        normalize_approximant("SEOBNRv4")
    ini = tmp_path / "pop.ini"
    ini.write_text("[prior-eccentricity]\nname = uniform\n"
                   "min-eccentricity = 0\nmax-eccentricity = 0.1\n")
    with pytest.raises(ValueError, match="eccentricity"):
        load_population(str(ini))
    ini.write_text("[prior-mass1]\nname = gaussian\n"
                   "min-mass1 = 5\nmax-mass1 = 20\n")
    with pytest.raises(ValueError, match="uniform mass"):
        load_population(str(ini))
    with pytest.raises(ValueError, match="ini or .json"):
        load_population("pop.yaml")


def test_generate_data_cli_population_roundtrip(tmp_path):
    """`gwkit-generate-data challenge --population foo.ini` produces an
    injection table drawn from the CONFIG's population, not the dataset
    default (VERDICT r3 #4 acceptance)."""
    from gwkit.cli.generate_data import main

    ini = tmp_path / "custom.ini"
    ini.write_text(DS2_LIKE_INI)
    fg, bg, inj = (str(tmp_path / n) for n in ("fg.hdf", "bg.hdf", "inj.hdf"))
    main([
        "--seed", "11", "challenge", "-d", "2", "--population", str(ini),
        "-f", fg, "-b", bg, "-i", inj,
        "--duration", "200", "--sample-rate", "512",
    ])
    with h5py.File(inj, "r") as f:
        m1 = f["mass1"][()]
        m2 = f["mass2"][()]
        s1z = f["spin1z"][()]
    assert len(m1) > 0
    # default ds2 is masses U(10,50), spins U(-0.99,0.99); the config said
    # masses U(5,20), spins U(-0.8,0.8) — max<=20 can only come from the file
    assert m1.max() <= 20.0 and m2.min() >= 5.0
    assert np.abs(s1z).max() <= 0.8


def test_generate_data_cli_population_parses():
    from gwkit.cli.generate_data import parse_args

    a = parse_args(["challenge", "-f", "f.hdf", "-b", "b.hdf", "-i", "i.hdf",
                    "--population", "pop.ini"])
    assert a.population == "pop.ini"
    t = parse_args(["training", "-o", "t.hdf", "--population", "pop.json"])
    assert t.population == "pop.json"
