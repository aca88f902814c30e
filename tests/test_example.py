"""The shipped end-to-end example must run (BASELINE config 4)."""

import runpy


def test_pulsar_pipeline_example(capsys):
    runpy.run_path("examples/pulsar_pipeline.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "recorded:" in out
    assert "psrfits:" in out
    assert "peak bin:" in out
