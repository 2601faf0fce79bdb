"""CLI config-file loading — reference semantics from
``src/cli/config.py`` (DEFAULT_CONFIG, deep-merge of the user file over
defaults, dotted get/set, graceful fallback to defaults when the file is
unreadable; config.py:14-163).  No Ray needed: the ``config`` subcommand
returns before the CLI touches Ray.
"""

import json
import subprocess
import sys

import yaml

from bio_data_validation_ray.config import (
    Config,
    DEFAULT_CONFIG,
    default_path,
    load_config,
    parse_scalar,
)


class TestConfig:
    def test_missing_file_yields_defaults(self, tmp_path):
        cfg = Config(tmp_path / "nope.yml")
        assert cfg.load_error is None
        assert cfg.to_dict() == DEFAULT_CONFIG
        assert cfg.get("output", "format") == "text"
        assert cfg.get("validation", "files_per_pass") == 64

    def test_deep_merge_preserves_sibling_defaults(self, tmp_path):
        p = tmp_path / "c.yml"
        p.write_text(yaml.dump({"output": {"format": "json"},
                                "validation": {"policy": "production"}}))
        cfg = Config(p)
        assert cfg.get("output", "format") == "json"
        assert cfg.get("validation", "policy") == "production"
        # siblings under the same mapping keep their defaults (deep, not
        # shallow, merge — reference config.py _deep_merge)
        assert cfg.get("output", "run_dir") is None
        assert cfg.get("validation", "strict") is False

    def test_unknown_keys_pass_through_and_get_default(self, tmp_path):
        p = tmp_path / "c.yml"
        p.write_text(yaml.dump({"extra": {"x": 1}}))
        cfg = Config(p)
        assert cfg.get("extra", "x") == 1
        assert cfg.get("extra", "missing", default=7) == 7
        assert cfg.get("no", "such", "path") is None

    def test_unreadable_file_falls_back_to_defaults(self, tmp_path):
        p = tmp_path / "c.yml"
        p.write_text("{{{{ not yaml ::::")
        cfg = Config(p)
        assert cfg.load_error is not None
        assert cfg.to_dict() == DEFAULT_CONFIG

    def test_non_mapping_top_level_is_an_error(self, tmp_path):
        p = tmp_path / "c.yml"
        p.write_text("- just\n- a list\n")
        cfg = Config(p)
        assert cfg.load_error is not None
        assert cfg.to_dict() == DEFAULT_CONFIG

    def test_set_creates_file_and_roundtrips(self, tmp_path):
        p = tmp_path / "sub" / "c.yml"
        cfg = Config(p)
        cfg.set("output", "format", "json")
        cfg.set("performance", "num_cpus", 8)
        again = load_config(p)
        assert again.get("output", "format") == "json"
        assert again.get("performance", "num_cpus") == 8
        # untouched defaults persisted too (the file is the merged view)
        assert again.get("validation", "policy") == "default"

    def test_default_path_env_override(self, monkeypatch, tmp_path):
        monkeypatch.setenv("BDVR_CONFIG", str(tmp_path / "x.yml"))
        assert default_path() == tmp_path / "x.yml"
        monkeypatch.delenv("BDVR_CONFIG")
        assert default_path().name == "config.yml"

    def test_parse_scalar_types(self):
        assert parse_scalar("true") is True
        assert parse_scalar("8") == 8
        assert parse_scalar("0.5") == 0.5
        assert parse_scalar("null") is None
        assert parse_scalar("production") == "production"

    def test_to_dict_is_a_copy(self, tmp_path):
        cfg = Config(tmp_path / "nope.yml")
        cfg.to_dict()["output"]["format"] = "mutated"
        assert cfg.get("output", "format") == "text"


class TestConfigCLI:
    def _run(self, *argv, env_path):
        return subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", *argv],
            capture_output=True, text=True, cwd="/root/repo",
            env={"PATH": "/usr/bin:/bin", "HOME": "/tmp",
                 "BDVR_CONFIG": str(env_path)},
        )

    def test_show_and_set_roundtrip(self, tmp_path):
        p = tmp_path / "c.yml"
        r = self._run("config", "show", env_path=p)
        assert r.returncode == 0, r.stderr[-500:]
        shown = json.loads(r.stdout)
        assert shown["exists"] is False
        assert shown["effective"]["output"]["format"] == "text"

        r = self._run("config", "set", "output.format", "json", env_path=p)
        assert r.returncode == 0, r.stderr[-500:]
        r = self._run("config", "show", env_path=p)
        shown = json.loads(r.stdout)
        assert shown["exists"] is True
        assert shown["effective"]["output"]["format"] == "json"

    def test_set_requires_key_value(self, tmp_path):
        r = self._run("config", "set", "output.format",
                      env_path=tmp_path / "c.yml")
        assert r.returncode == 2

    def test_explicit_config_flag_wins_over_env(self, tmp_path):
        flagged = tmp_path / "flagged.yml"
        env = tmp_path / "env.yml"
        env.write_text(yaml.dump({"output": {"format": "json"}}))
        r = self._run("--config", str(flagged), "config", "show",
                      env_path=env)
        shown = json.loads(r.stdout)
        assert shown["config_path"] == str(flagged)
        assert shown["effective"]["output"]["format"] == "text"

    def test_unreadable_config_warns_and_continues(self, tmp_path):
        p = tmp_path / "c.yml"
        p.write_text("{{{{ not yaml")
        r = self._run("config", "show", env_path=p)
        assert r.returncode == 0
        assert "unreadable" in r.stderr
        assert json.loads(r.stdout)["effective"] == DEFAULT_CONFIG

    def test_config_file_drives_validate_defaults(self, tmp_path):
        """End-to-end: a config file supplying output.format=json and
        policy=lenient changes validate's behavior without flags; an
        explicit flag still wins (reference config.py precedence)."""
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        clean = ensure_transcripts("sf0.001", clean=True)
        p = tmp_path / "c.yml"
        p.write_text(yaml.dump({
            "output": {"format": "json"},
            "validation": {"policy": "lenient"},
            "performance": {"num_cpus": 4},
        }))
        r = self._run("validate", clean, "--run-dir",
                      str(tmp_path / "run"), env_path=p)
        assert r.returncode == 0, r.stderr[-800:]
        rep = json.loads(r.stdout)  # json format came from the config file
        assert rep["policy"] == "lenient"
        # explicit flag beats the file
        r = self._run("validate", clean, "--run-dir",
                      str(tmp_path / "run2"), "--format", "text",
                      "--policy", "default", env_path=p)
        assert r.returncode == 0, r.stderr[-800:]
        assert r.stdout.lstrip().startswith("validation ")
