"""Logger / observability tests (reference analogue: MadNLPLogger print
levels and file sink, src/utils.jl:131-137; per-iteration table,
src/structure.jl:180-197)."""

import io
import os

import numpy as np
import pytest

import madipm_tpu as mt
from madipm_tpu.utils.logging import Logger, profile_trace
from madipm_tpu.utils.options import PrintLevel


def simple_lp():
    return mt.from_dense(
        c=[1.0, 1.0], A=[[1.0, 1.0]], lcon=[1.0], ucon=[1.0],
        lvar=[0.0, 0.0], uvar=[np.inf, np.inf],
    )


class TestLogger:
    def test_level_gating(self):
        buf = io.StringIO()
        log = Logger(print_level=PrintLevel.NOTICE, stream=buf)
        log.debug("hidden")
        log.info("hidden too")
        log.notice("shown")
        log.error("also shown")
        out = buf.getvalue()
        assert "hidden" not in out
        assert "shown" in out and "also shown" in out

    def test_file_sink(self, tmp_path):
        f = str(tmp_path / "log.txt")
        buf = io.StringIO()
        log = Logger(
            print_level=PrintLevel.ERROR,  # console quiet
            file_print_level=PrintLevel.DEBUG,  # file verbose
            output_file=f,
            stream=buf,
        )
        log.debug("to file only")
        log.close()
        assert "to file only" not in buf.getvalue()
        with open(f) as fh:
            assert "to file only" in fh.read()

    def test_solve_writes_output_file(self, tmp_path):
        f = str(tmp_path / "solve.log")
        stats = mt.madipm(
            simple_lp(),
            print_level=mt.PrintLevel.ERROR,  # console quiet
            file_print_level=mt.PrintLevel.INFO,
            output_file=f,
        )
        assert stats.success
        with open(f) as fh:
            content = fh.read()
        # per-iteration table went to the file even with a quiet console
        assert "inf_pr" in content and "EXIT" in content

    def test_iteration_table_on_console(self, capsys):
        stats = mt.madipm(simple_lp(), print_level=mt.PrintLevel.INFO)
        assert stats.success
        out = capsys.readouterr().out
        assert "inf_pr" in out and "EXIT" in out


class TestProfileTrace:
    def test_noop_without_dir(self):
        with profile_trace(None):
            pass
        with profile_trace(""):
            pass

    def test_captures_trace(self, tmp_path):
        d = str(tmp_path / "trace")
        solver = mt.MPCSolver(simple_lp(), print_level=mt.PrintLevel.ERROR)
        stats = solver.solve(trace_dir=d)
        assert stats.success
        # jax profiler writes plugins/profile/<ts>/*.xplane.pb
        found = []
        for root, _, files in os.walk(d):
            found += [f for f in files if f.endswith(".xplane.pb")]
        assert found, f"no trace written under {d}"
