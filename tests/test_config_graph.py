"""Tests for the config system and pose-graph operations."""

import os

import pytest

from neural_graph_mapping_tpu import config as cfg
from neural_graph_mapping_tpu.mapping import graph


class TestConfig:
    def test_merge_and_overrides(self, tmp_path):
        (tmp_path / "base.yaml").write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
        (tmp_path / "top.yaml").write_text("nested:\n  y: 3\nb: hello\n")
        out = cfg.load_config_from_args(
            ["--config", "base.yaml", "top.yaml", "--nested.x", "9", "--c", "true"],
            search_paths=[str(tmp_path)],
        )
        assert out == {"a": 1, "nested": {"x": 9, "y": 3}, "b": "hello", "c": True}

    def test_parent_config_key(self, tmp_path):
        (tmp_path / "parent.yaml").write_text("a: 1\nb: 2\n")
        (tmp_path / "child.yaml").write_text("config: parent.yaml\nb: 3\n")
        out = cfg.load_config("child.yaml", search_paths=[str(tmp_path)])
        assert out == {"a": 1, "b": 3}

    def test_load_config_dict_over_defaults(self):
        out = cfg.load_config({"b": 2}, current_dict={"a": 1, "b": 1})
        assert out == {"a": 1, "b": 2}

    def test_equals_style_override(self, tmp_path):
        (tmp_path / "c.yaml").write_text("a: 1\n")
        out = cfg.load_config_from_args(
            ["--config", "c.yaml", "--a=5"], search_paths=[str(tmp_path)]
        )
        assert out["a"] == 5

    def test_yaml_value_parsing(self, tmp_path):
        (tmp_path / "c.yaml").write_text("x: 0\n")
        out = cfg.load_config_from_args(
            ["--config", "c.yaml", "--x", "[1, 2]", "--y", "null", "--z", "1e-3"],
            search_paths=[str(tmp_path)],
        )
        assert out["x"] == [1, 2] and out["y"] is None and abs(out["z"] - 1e-3) < 1e-12

    def test_save_roundtrip(self, tmp_path):
        path = tmp_path / "out.yaml"
        cfg.save_config_to_file(path, {"a": 1, "nested": {"b": [1, 2]}})
        out = cfg.load_config(str(path), search_paths=[str(tmp_path)])
        assert out == {"a": 1, "nested": {"b": [1, 2]}}

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            cfg.resolve_path("definitely_not_here.yaml", search_paths=["/tmp"])

    def test_str_to_object(self):
        obj = cfg.str_to_object("neural_graph_mapping_tpu.models.fields.NeuralField")
        from neural_graph_mapping_tpu.models.fields import NeuralField

        assert obj is NeuralField


class TestGraph:
    def make_chain(self, n=6):
        g = {i: set() for i in range(n)}
        for i in range(n - 1):
            g[i].add(i + 1)
            g[i + 1].add(i)
        return g

    def test_neighbors_one_hop(self):
        g = self.make_chain()
        assert graph.get_neighbors(g, {2}, max_edges=1) == {1, 3}

    def test_neighbors_multi_hop_include_queries(self):
        g = self.make_chain()
        got = graph.get_neighbors(g, {0}, max_edges=3, include_queries=True)
        assert got == {0, 1, 2, 3}

    def test_neighbors_exclude_queries(self):
        g = self.make_chain()
        got = graph.get_neighbors(g, {0}, max_edges=3)
        assert got == {1, 2, 3}

    def test_loop_closure_edge_shortens_distance(self):
        g = self.make_chain(10)
        g[0].add(9)
        g[9].add(0)
        got = graph.get_neighbors(g, {0}, max_edges=1)
        assert got == {1, 9}

    def test_remove_vertex(self):
        g = self.make_chain()
        g2 = graph.remove_vertex(g, 2)
        assert 2 not in g2
        assert 2 not in g2[1] and 2 not in g2[3]
        # original untouched
        assert 2 in g[1]
