"""Unit tests for the adjustment GUI's nudge/override semantics
(reference `keyboardCall`, `code/utils/utils.py:504-572`).

The app is constructed without a session/fit (``__new__`` + the few
fields ``nudge``/``_effective`` touch) so the clamp/override logic is
testable in milliseconds; the full server is exercised manually via
the /verify recipe.
"""

import threading
import types

import jax.numpy as jnp
import numpy as np

from mvsmplfitting_tpu.cli.adjust_gui import AdjustApp
from mvsmplfitting_tpu.models.smpl import SMPLParams


def _params(betas=None, orient=None, transl=None):
    return SMPLParams(
        betas=jnp.asarray(betas if betas is not None
                          else np.zeros(10, np.float32)),
        global_orient=jnp.asarray(orient if orient is not None
                                  else np.zeros(3, np.float32)),
        body_pose=jnp.zeros(69),     # VPoser mode: pack() keeps zeros
        transl=jnp.asarray(transl if transl is not None
                           else np.asarray([0., 0., 2.], np.float32)),
        scale=jnp.asarray(1.0))


def _app(fitted_pose):
    app = AdjustApp.__new__(AdjustApp)
    result = types.SimpleNamespace(params=_params(),
                                   body_pose=jnp.asarray(fitted_pose),
                                   z=jnp.zeros(32),
                                   loss=jnp.asarray(1.0))
    app.result = result
    app.init_result = result
    app.override = None
    app.lock = threading.Lock()
    return app


class TestNudgeSemantics:
    def test_effective_pose_survives_betas_nudge(self):
        """Regression: under VPoser the fitted pose lives in
        result.body_pose; a betas nudge must NOT snap the effective
        pose back to params.body_pose == zeros (T-pose overlay bug)."""
        fitted = np.linspace(-0.4, 0.4, 69).astype(np.float32)
        app = _app(fitted)
        app.nudge("betas", 2, 1.0)
        params, bp = app._effective()
        np.testing.assert_allclose(bp, fitted, atol=1e-6)
        assert float(np.asarray(params.betas)[2]) == 1.0

    def test_body_pose_nudge_kept_in_override(self):
        fitted = np.zeros(69, np.float32)
        app = _app(fitted)
        app.nudge("body_pose", 5, 0.02)
        _, bp = app._effective()
        assert bp[5] == np.float32(0.02)
        # and a later betas nudge keeps it
        app.nudge("betas", 0, -1.0)
        _, bp = app._effective()
        assert bp[5] == np.float32(0.02)

    def test_clamps_anchor_to_initial_fit(self):
        """Bounds are the reference's: pose init+-0.5, transl/orient
        init+-1, betas absolute [-10, 10] — NOT relative to the moving
        value (which would never bind)."""
        fitted = np.zeros(69, np.float32)
        app = _app(fitted)
        for _ in range(40):                      # 40 x 0.02 = 0.8
            app.nudge("body_pose", 3, 0.02)
        _, bp = app._effective()
        assert abs(bp[3] - 0.5) < 1e-6           # hard stop at +0.5

        for _ in range(30):                      # 30 x 0.05 = 1.5
            app.nudge("transl", 0, 0.05)
        params, _ = app._effective()
        assert abs(float(np.asarray(params.transl)[0]) - 1.0) < 1e-6

        for _ in range(15):
            app.nudge("betas", 1, -1.0)
        params, _ = app._effective()
        assert float(np.asarray(params.betas)[1]) == -10.0

    def test_no_override_returns_result(self):
        fitted = np.full(69, 0.1, np.float32)
        app = _app(fitted)
        params, bp = app._effective()
        np.testing.assert_allclose(bp, fitted)
        assert params is app.result.params
