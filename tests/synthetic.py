"""Synthetic scene renderer — re-exported from the package for test use.

The implementation lives in multimotionfusion_tpu/io/synthetic.py so the app
and benchmarks can use it too (the reference had no equivalent; it replayed
recorded bags, SURVEY.md §4).
"""

from multimotionfusion_tpu.io.synthetic import (  # noqa: F401
    pose,
    render,
    render_moving_sphere,
)
