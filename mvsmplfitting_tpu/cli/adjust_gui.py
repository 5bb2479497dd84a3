"""Interactive keypoint/pose adjustment GUI (browser-based).

The reference's `adjustment: true` mode opens cv2 windows for hand
editing: click/drag 2D keypoints (`change`/`changeNew`/`points_move`,
`code/utils/utils.py:61-205`) and keyboard nudging of shape / global
orientation / translation / body pose (`keyboardCall`,
`utils.py:504-572`), followed by a re-optimization round at the final
stage's weights (`non_linear_solver.py:213-270`).

cv2 windows need a display; a TPU pod does not have one.  The same
capability lands here as a self-contained browser app served from the
stdlib http server: per-view overlay canvases with draggable
keypoints, the reference's exact key bindings (a/d betas +-1 on the
selected dim, z/c orient +-0.05, v/n transl +-0.05, q/e body pose
+-0.02, s/x/b cycle the active dim, r reset), and a Refit button that
reruns the final-stage solve warm-started from the current result
(`fitting/adjust.py:refit_with_observations`).

    python -m mvsmplfitting_tpu.cli.adjust_gui --config <yaml> \
        [--port 8765] [--no_browser]
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>mvsmplfitting adjust</title>
<style>
 body { font-family: sans-serif; background: #181818; color: #ddd; }
 canvas { border: 1px solid #444; margin: 4px; cursor: crosshair; }
 #bar { position: sticky; top: 0; background: #222; padding: 8px; }
 button { margin-right: 8px; }
 .dim { color: #8cf; }
</style></head><body>
<div id="bar">
 <button id="refit">Refit (final-stage solve)</button>
 <button id="save">Save results</button>
 <span id="loss"></span>
 <div>keys: <b>a/d</b> beta&plusmn;1 (<b>s</b> cycles dim
 <span class="dim" id="sd">0</span>) &middot; <b>z/c</b> orient&plusmn;.05
 (<b>x</b> cycles <span class="dim" id="oa">0</span>) &middot;
 <b>v/n</b> transl&plusmn;.05 (<b>b</b> cycles
 <span class="dim" id="ta">0</span>) &middot; <b>q/e</b> pose&plusmn;.02
 (joint <input id="ji" type="number" value="0" min="0" max="22"
 style="width:3em"> axis <b>w</b> cycles
 <span class="dim" id="ka">0</span>) &middot; <b>r</b> reset &middot;
 drag keypoints to edit</div>
</div>
<div id="views"></div>
<script>
let state = null, drag = null;
const dims = {sd: 0, oa: 0, ta: 0, ka: 0};
async function load() {
  state = await (await fetch('/api/state')).json();
  document.getElementById('loss').textContent =
    ' loss: ' + state.loss.toFixed(2);
  const root = document.getElementById('views');
  root.innerHTML = '';
  state.views.forEach((v, vi) => {
    const c = document.createElement('canvas');
    c.width = v.width; c.height = v.height;
    c.dataset.view = vi;
    root.appendChild(c);
    const img = new Image();
    img.onload = () => { draw(c, img, vi); c._img = img; };
    img.src = 'data:image/jpeg;base64,' + v.img;
    c.onmousedown = e => {
      const r = c.getBoundingClientRect();
      const x = e.clientX - r.left, y = e.clientY - r.top;
      let best = -1, bd = 144;   /* 12px pick radius, like change() */
      state.views[vi].keypoints.forEach((k, j) => {
        const d = (k[0]-x)**2 + (k[1]-y)**2;
        if (d < bd) { bd = d; best = j; }
      });
      if (best >= 0) drag = {view: vi, joint: best, canvas: c};
    };
    c.onmousemove = e => {
      if (!drag || drag.canvas !== c) return;
      const r = c.getBoundingClientRect();
      const k = state.views[drag.view].keypoints[drag.joint];
      k[0] = e.clientX - r.left; k[1] = e.clientY - r.top;
      k[2] = Math.max(k[2], 0.9);   /* edited points become confident */
      draw(c, c._img, vi);
    };
    c.onmouseup = async e => {
      if (!drag) return;
      const k = state.views[drag.view].keypoints[drag.joint];
      await fetch('/api/keypoint', {method: 'POST', body: JSON.stringify(
        {view: drag.view, joint: drag.joint, x: k[0], y: k[1]})});
      drag = null;
    };
  });
}
function draw(c, img, vi) {
  const g = c.getContext('2d');
  g.drawImage(img, 0, 0);
  state.views[vi].keypoints.forEach(k => {
    g.fillStyle = k[2] > 0.2 ? '#f33' : '#666';
    g.beginPath(); g.arc(k[0], k[1], 4, 0, 7); g.fill();
  });
}
document.addEventListener('keydown', async e => {
  const cyc = {s: ['sd', 10], x: ['oa', 3], b: ['ta', 3], w: ['ka', 3]};
  if (cyc[e.key]) {
    const [id, m] = cyc[e.key];
    dims[id] = (dims[id] + 1) % m;
    document.getElementById(id).textContent = dims[id];
    return;
  }
  const ji = +document.getElementById('ji').value;
  const nudges = {
    a: ['betas', dims.sd, -1.0], d: ['betas', dims.sd, 1.0],
    z: ['global_orient', dims.oa, -0.05],
    c: ['global_orient', dims.oa, 0.05],
    v: ['transl', dims.ta, -0.05], n: ['transl', dims.ta, 0.05],
    q: ['body_pose', 3 * ji + dims.ka, -0.02],
    e: ['body_pose', 3 * ji + dims.ka, 0.02],
  };
  if (e.key === 'r') {
    await fetch('/api/nudge', {method: 'POST',
      body: JSON.stringify({reset: true})});
    await load(); return;
  }
  if (nudges[e.key]) {
    const [f, i, d] = nudges[e.key];
    await fetch('/api/nudge', {method: 'POST', body: JSON.stringify(
      {field: f, index: i, delta: d})});
    await load();
  }
});
document.getElementById('refit').onclick = async () => {
  document.getElementById('loss').textContent = ' solving...';
  await fetch('/api/refit', {method: 'POST'});
  await load();
};
document.getElementById('save').onclick = async () => {
  const r = await (await fetch('/api/save', {method: 'POST'})).json();
  alert('saved: ' + r.path);
};
load();
</script></body></html>"""


class AdjustApp:
    """Holds the session, current frame state, and re-fit logic."""

    def __init__(self, cfg, sess, frame, max_size: int = 640):
        import jax.numpy as jnp

        from ..data.dataset import frame_to_observations
        from ..fitting import fit_frame, init_guess

        self.cfg = cfg
        self.sess = sess
        self.frame = frame
        self.max_size = max_size
        self.obs = frame_to_observations(frame, sess.joint_weights)
        self.img_h = float(frame.img_hw[0])

        guess = init_guess(sess.assets, sess.cameras, self.obs.gt2d,
                           self.obs.conf, self.obs.view_mask,
                           est_scale=not cfg.fix_scale)
        self.result = fit_frame(sess.fit_config, sess.assets,
                                sess.cameras, self.obs,
                                guess.params, guess.z,
                                vposer_w=sess.vposer, gmm=sess.gmm,
                                img_height=self.img_h)
        self.init_result = self.result
        # Editable copies (image-space keypoints per view).
        self.keypoints = np.asarray(frame.keypoints[:, 0]).copy()
        # Nudge override: the EFFECTIVE full state the user is editing —
        # params plus the decoded 69-dim body pose (under VPoser the
        # fitted pose lives in result.body_pose, NOT params.body_pose,
        # which pack/unpack keep at zeros).
        self.override = None      # {"params": SMPLParams, "body_pose"}
        self.lock = threading.Lock()

    def _effective(self):
        """(params, body_pose) the user currently sees."""
        if self.override is not None:
            return self.override["params"], self.override["body_pose"]
        return self.result.params, np.asarray(self.result.body_pose)

    # -- reference keyboardCall semantics (`utils.py:504-572`) --------
    def nudge(self, field: str, index: int, delta: float):
        """Clamps follow the reference: pose within +-0.5 and
        orient/transl within +-1 of the ORIGINAL fit, betas in the
        absolute [-10, 10] band (`utils.py:508-514`) — bounds anchored
        to the initial solution, not the moving value."""
        import jax.numpy as jnp
        with self.lock:
            params, bp = self._effective()
            bp = np.asarray(bp).copy()
            if field == "body_pose":
                ref = float(np.asarray(
                    self.init_result.body_pose)[index])
                bp[index] = np.clip(bp[index] + delta,
                                    ref - 0.5, ref + 0.5)
                self.override = {"params": params, "body_pose": bp}
                return
            arr = np.atleast_1d(
                np.asarray(getattr(params, field))).copy()
            if field == "betas":
                lo, hi = -10.0, 10.0
            else:               # global_orient / transl: original +-1
                ref = np.atleast_1d(np.asarray(
                    getattr(self.init_result.params, field)))
                lo, hi = ref[index] - 1.0, ref[index] + 1.0
            arr[index] = np.clip(arr[index] + delta, lo, hi)
            val = jnp.asarray(arr if arr.size > 1 else arr[0])
            self.override = {"params": params.replace(**{field: val}),
                             "body_pose": bp}

    def reset(self):
        with self.lock:
            self.override = None
            self.result = self.init_result
            self.keypoints = np.asarray(
                self.frame.keypoints[:, 0]).copy()

    def set_keypoint(self, view: int, joint: int, x: float, y: float):
        s = self._scale(view)
        with self.lock:
            self.keypoints[view, joint, 0] = x / s
            self.keypoints[view, joint, 1] = y / s
            self.keypoints[view, joint, 2] = max(
                float(self.keypoints[view, joint, 2]), 0.9)

    def refit(self):
        import jax.numpy as jnp

        from ..fitting.adjust import refit_with_observations

        with self.lock:
            kp = jnp.asarray(self.keypoints)
            new_obs = self.obs.replace(gt2d=kp[..., :2],
                                       conf=kp[..., 2])
            prev = self.result
            params_override = None
            if self.override is not None:
                params_override = self.override["params"]
                bp = jnp.asarray(self.override["body_pose"])
                if self.sess.fit_config.spec.use_vposer:
                    # pack() ignores params.body_pose under VPoser; the
                    # pose edit warm-starts through the encoder instead.
                    from ..models.vposer import encode_mean
                    prev = prev.replace(
                        z=encode_mean(self.sess.vposer, bp))
                else:
                    params_override = params_override.replace(
                        body_pose=bp)
            self.result = refit_with_observations(
                self.sess.fit_config, self.sess.assets,
                self.sess.cameras, new_obs, prev,
                vposer_w=self.sess.vposer, gmm=self.sess.gmm,
                img_height=self.img_h,
                params_override=params_override)
            self.override = None

    def _scale(self, view: int) -> float:
        h, w = self.frame.img_hw
        return min(1.0, self.max_size / max(h, w))

    def state(self) -> dict:
        import cv2
        import jax.numpy as jnp

        from ..models.smpl import smpl_forward
        from ..viz.overlay import render_mesh_overlay

        with self.lock:
            params, body_pose = self._effective()
            keypoints = self.keypoints.copy()
            loss = float(self.result.loss)
        verts, _ = smpl_forward(self.sess.assets, params,
                                jnp.asarray(body_pose))
        verts = np.asarray(verts)
        faces = np.asarray(self.sess.assets.faces)
        cams = self.sess.cameras
        R = np.asarray(cams.rotation)
        t = np.asarray(cams.translation)
        fo = np.asarray(cams.focal)
        ce = np.asarray(cams.center)

        views = []
        for v, img_path in enumerate(self.frame.img_paths):
            if img_path and os.path.exists(img_path):
                img = cv2.imread(img_path)
            else:
                h, w = self.frame.img_hw
                img = np.full((int(h), int(w), 3), 32, np.uint8)
            img = render_mesh_overlay(img, verts, faces, R[v], t[v],
                                      fo[v], ce[v])
            s = self._scale(v)
            if s < 1.0:
                img = cv2.resize(img, None, fx=s, fy=s)
            ok, buf = cv2.imencode(".jpg", img,
                                   [cv2.IMWRITE_JPEG_QUALITY, 80])
            views.append({
                "img": base64.b64encode(buf.tobytes()).decode(),
                "width": img.shape[1], "height": img.shape[0],
                "keypoints": [[float(x * s), float(y * s), float(c)]
                              for x, y, c in keypoints[v]],
            })
        return {"views": views, "loss": loss,
                "transl": np.asarray(params.transl).tolist(),
                "scale": float(np.asarray(params.scale))}

    def save(self) -> str:
        from ..data.results import FitOutputs, save_result_pkl

        with self.lock:
            result = self.result
        out = FitOutputs(
            betas=np.asarray(result.params.betas),
            global_orient=np.asarray(result.params.global_orient),
            transl=np.asarray(result.params.transl),
            scale=np.asarray(result.params.scale),
            body_pose=np.asarray(result.body_pose),
            pose_embedding=np.asarray(result.z),
            loss=float(result.loss))
        path = os.path.join(self.cfg.output_folder, "adjusted",
                            self.frame.serial, self.frame.frame_name,
                            "000.pkl")
        save_result_pkl(path, out)
        return path


def make_handler(app: AdjustApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet
            pass

        def _send(self, body, ctype="application/json"):
            data = body if isinstance(body, bytes) else \
                json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/":
                self._send(_PAGE.encode(), "text/html; charset=utf-8")
            elif self.path == "/api/state":
                self._send(app.state())
            else:
                self.send_error(404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/api/keypoint":
                app.set_keypoint(int(body["view"]), int(body["joint"]),
                                 float(body["x"]), float(body["y"]))
                self._send({"ok": True})
            elif self.path == "/api/nudge":
                if body.get("reset"):
                    app.reset()
                else:
                    app.nudge(body["field"], int(body["index"]),
                              float(body["delta"]))
                self._send({"ok": True})
            elif self.path == "/api/refit":
                app.refit()
                self._send({"ok": True, "loss": float(app.result.loss)})
            elif self.path == "/api/save":
                self._send({"ok": True, "path": app.save()})
            else:
                self.send_error(404)

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="browser adjustment GUI")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--frame", type=str, default=None,
                   help="serial/frame_name (default: first frame)")
    p.add_argument("--no_browser", action="store_true",
                   help="don't try to open a local browser tab")
    args = p.parse_args(argv)

    from ..config import load_config
    from ..session import build_session

    cfg = load_config(args.config)
    sess = build_session(cfg)
    frame = None
    for f in sess.dataset:
        if args.frame in (None, f"{f.serial}/{f.frame_name}"):
            frame = f
            break
    if frame is None:
        raise SystemExit(f"frame {args.frame} not found")

    print(f"fitting {frame.serial}/{frame.frame_name} ...")
    app = AdjustApp(cfg, sess, frame)
    print(f"adjust GUI at http://127.0.0.1:{args.port}/ "
          f"(loss {float(app.result.loss):.2f})")
    server = ThreadingHTTPServer(("127.0.0.1", args.port),
                                 make_handler(app))
    if not args.no_browser:
        try:
            import webbrowser
            webbrowser.open(f"http://127.0.0.1:{args.port}/")
        except Exception:
            pass            # headless host: the URL above still works
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
