"""The shipped end-to-end example must run (BASELINE config 4)."""

import runpy


def test_pulsar_pipeline_example(capsys):
    runpy.run_path("examples/pulsar_pipeline.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "recorded:" in out
    assert "psrfits:" in out
    assert "peak bin:" in out


def test_frb_search_example(capsys):
    runpy.run_path("examples/frb_search.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "burst recovered at the true DM and arrival time - OK" in out


def test_compiled_fold_example(capsys):
    runpy.run_path("examples/compiled_fold.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "ok" in out and "folded" in out


def test_tied_array_example(capsys):
    runpy.run_path("examples/tied_array.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "calibration loop closed" in out


def test_calibrated_fold_example(capsys):
    runpy.run_path("examples/calibrated_fold.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "calibrated masked fold ok" in out


def test_binary_search_example(capsys):
    runpy.run_path("examples/binary_search.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "binary search closed OK" in out
    assert "z = +12 bins" in out
