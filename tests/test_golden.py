"""Fixed-seed golden renders for every renderer (SURVEY §4 item 5).

Goldens are generated on the forced-CPU backend (tests/golden_tools.py);
comparison allows small cross-backend float drift but catches any
behavioral change. Regenerate intentionally with
``python tests/golden_tools.py regen``.
"""

import os

import numpy as np
import pytest

from golden_tools import GOLDEN_PATH, render_all


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("goldens not generated (python tests/golden_tools.py regen)")
    return dict(np.load(GOLDEN_PATH))


def test_goldens_match(goldens):
    rendered = render_all()
    assert set(rendered) == set(goldens)
    for name, img in rendered.items():
        np.testing.assert_allclose(
            img, goldens[name], rtol=1e-4, atol=1e-5,
            err_msg=f"golden mismatch for renderer {name!r}",
        )


def test_goldens_nontrivial(goldens):
    for name, img in goldens.items():
        assert np.isfinite(img).all(), name
        assert np.abs(img).max() > 0, f"{name} rendered nothing"
