"""Config precedence chain + Main() CLI parity tests.

Ports the reference's config behaviors (config.go:7-45: defaults <
corralrc file < CORRAL_* env < flags, aliases v/o) and the Main() flag
surface (driver.go:219-247: --out/-o, --verbose/-v, positional
inputs, execution-time print) onto the facade.
"""

from __future__ import annotations

import json
import os

from corral_spark.mapreduce import Driver, Job
from corral_spark.mapreduce.config import DEFAULTS, load_config
from tests.test_mapreduce import WCMapper, WCReducer, read_output


def test_defaults_match_reference():
    # reference config.go:20-33 (minus lambda-deployment keys)
    conf = load_config(cwd="/nonexistent", env={})
    assert conf["splitSize"] == 100 * 1024 * 1024
    assert conf["mapBinSize"] == 512 * 1024 * 1024
    assert conf["reduceBinSize"] == 512 * 1024 * 1024
    assert conf["maxConcurrency"] == 500
    assert conf["workingLocation"] == "."
    assert conf["cleanup"] is True
    assert conf["verbose"] is False


def test_config_file_overrides_defaults(tmp_path):
    (tmp_path / "corralrc.json").write_text(
        json.dumps({"splitSize": 1234, "verbose": True})
    )
    conf = load_config(cwd=str(tmp_path), env={})
    assert conf["splitSize"] == 1234
    assert conf["verbose"] is True
    assert conf["mapBinSize"] == DEFAULTS["mapBinSize"]  # untouched


def test_env_overrides_file(tmp_path):
    (tmp_path / "corralrc.json").write_text(json.dumps({"splitSize": 1234}))
    conf = load_config(
        cwd=str(tmp_path),
        env={"CORRAL_SPLITSIZE": "999", "CORRAL_VERBOSE": "true"},
    )
    assert conf["splitSize"] == 999
    assert conf["verbose"] is True


def test_flags_override_env(tmp_path):
    conf = load_config(
        cwd=str(tmp_path),
        env={"CORRAL_WORKINGLOCATION": "/from-env"},
        overrides={"workingLocation": "/from-flag"},
    )
    assert conf["workingLocation"] == "/from-flag"


def test_aliases_and_case_insensitivity(tmp_path):
    # reference config.go:38-44: v -> verbose, o -> working location
    (tmp_path / "corralrc.json").write_text(json.dumps({"o": "/rc-out"}))
    conf = load_config(cwd=str(tmp_path), env={"CORRAL_V": "1"})
    assert conf["workingLocation"] == "/rc-out"
    assert conf["verbose"] is True


def test_unknown_keys_ignored(tmp_path):
    (tmp_path / "corralrc.json").write_text(
        json.dumps({"lambdaMemory": 1500, "nonsense": 1})
    )
    conf = load_config(cwd=str(tmp_path), env={"CORRAL_NOPE": "x"})
    assert "lambdaMemory" not in conf
    assert "nonsense" not in conf


def test_constructor_arg_beats_env(tmp_path, monkeypatch):
    monkeypatch.setenv("CORRAL_WORKINGLOCATION", "/env-wins-not")
    d = Driver(Job(WCMapper(), WCReducer()), [], str(tmp_path))
    assert d.working_location == str(tmp_path)


def test_env_working_location_used_when_arg_omitted(tmp_path, monkeypatch):
    monkeypatch.setenv("CORRAL_O", str(tmp_path))
    d = Driver(Job(WCMapper(), WCReducer()), [])
    assert d.working_location == str(tmp_path)


def test_cli_out_flag_and_positional_inputs(spark, tmp_path, capsys):
    # reference driver.go:235-247: positional args append to inputs,
    # --out overrides the working location, time is printed.
    (tmp_path / "in.txt").write_text("x y x\n")
    out_dir = tmp_path / "cli-out"
    out_dir.mkdir()
    d = Driver(Job(WCMapper(), WCReducer()), [], str(tmp_path), spark=spark)
    d.main(["--out", str(out_dir), str(tmp_path / "in.txt")])
    assert read_output(str(out_dir)) == {("x", "2"), ("y", "1")}
    assert "Job Execution Time:" in capsys.readouterr().out


def test_cli_verbose_flag(spark, tmp_path):
    d = Driver(Job(WCMapper(), WCReducer()), [], str(tmp_path), spark=spark)
    d.main(["-v"])  # no inputs -> graceful no-op, but flag must stick
    assert d.config["verbose"] is True


def test_split_size_controls_parallelism(spark, tmp_path, monkeypatch):
    # A ~60-byte input with splitSize=16 must read as >= 4 splits; the
    # facade's default num_bins follows the input partition count, so
    # the output fans out into >= 4 part files.
    monkeypatch.setenv("CORRAL_SPLITSIZE", "16")
    (tmp_path / "in.txt").write_text("aa bb\n" * 10)
    d = Driver(
        Job(WCMapper(), WCReducer()),
        [str(tmp_path / "in.txt")],
        str(tmp_path),
        spark=spark,
    )
    assert d.config["splitSize"] == 16
    d.run()
    parts = [f for f in os.listdir(tmp_path) if f.startswith("output-part-")]
    assert len(parts) >= 4
    assert read_output(str(tmp_path)) == {("aa", "10"), ("bb", "10")}


def test_object_store_conf_surface():
    from corral_spark.session import object_store_conf

    conf = object_store_conf()
    # Committer must be the multipart-manifest (magic) committer —
    # rename-based commit is O(data) and non-atomic on object stores.
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert "PathOutputCommitProtocol" in conf["spark.sql.sources.commitProtocolClass"]
    assert conf["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "random"
    # Every value must be a string (SparkConf contract).
    assert all(isinstance(v, str) for v in conf.values())
