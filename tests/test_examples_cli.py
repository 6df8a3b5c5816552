"""CLI example drivers end-to-end on chesapeake.mtx with --validate —
the reference's integration-test strategy (SURVEY.md section 4:
"Integration tests = example binaries with --validate")."""

import json
import sys

import pytest

CHESAPEAKE = "/root/reference/datasets/chesapeake/chesapeake.mtx"


def _run(mod_name, argv):
    mod = __import__(f"gunrock_tpu.examples.{mod_name}", fromlist=["main"])
    mod.main(argv)


@pytest.mark.parametrize(
    "algo,extra",
    [
        ("bfs", ["--src", "0", "--validate"]),
        ("sssp", ["--src", "0", "--validate"]),
        ("pr", ["--validate"]),
        ("bc", ["--src", "0", "--validate"]),
        ("color", ["--validate"]),
        ("kcore", ["--validate"]),
        ("tc", ["--validate"]),
        ("spmv", ["--validate"]),
        ("hits", ["--validate", "--max_iterations", "20"]),
        ("mst", ["--validate"]),
        ("ppr", ["--src", "0"]),
        ("geo", ["--spatial_iterations", "25"]),
        ("spgemm", ["--validate"]),
    ],
)
def test_example_driver(algo, extra, capsys):
    _run(algo, ["--market", CHESAPEAKE] + extra)
    out = capsys.readouterr().out
    assert "FAILED" not in out


def test_export_metrics_json_schema(tmp_path):
    _run(
        "bfs",
        [
            "--market", CHESAPEAKE, "--src", "0", "--num_runs", "2",
            "--export_metrics", "--json_dir", str(tmp_path),
            "--json_file", "out.json", "--tag", "ci,smoke",
        ],
    )
    data = json.loads((tmp_path / "out.json").read_text())
    # the reference's measurement-contract keys (performance.hxx:82-283)
    for key in (
        "engine", "schema", "primitive", "graph_file", "num_vertices",
        "num_edges", "process_times", "avg_process_time",
        "stddev_process_time", "min_process_time", "max_process_time",
        "mteps", "avg_mteps", "edges_visited", "nodes_visited",
        "search_depths", "avg_search_depth", "srcs", "tags",
        "command_line", "git_commit_sha", "gpuinfo", "sysinfo", "time",
    ):
        assert key in data, key
    assert data["schema"] == "2022-10-28"
    assert data["primitive"] == "bfs"
    assert len(data["process_times"]) == 2
    assert data["tags"] == ["ci", "smoke"]
    assert data["num_vertices"] == 39


def test_csr_binary_roundtrip(tmp_path):
    from gunrock_tpu.examples import csr_binary
    from gunrock_tpu.formats import Csr

    out = tmp_path / "chesapeake.csr"
    csr_binary.main([CHESAPEAKE, str(out)])
    csr = Csr.read_binary(out)
    assert csr.n_rows == 39 and csr.nnz == 340
    # CLI auto-detects binary CSR by extension (parameters.hxx:99-101)
    _run("bfs", ["--market", str(out), "--src", "0", "--validate"])
