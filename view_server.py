"""Headless render/view service (reference view_viser.py replacement).

A stdlib HTTP server exposing the viewer capabilities without GUI deps:

  GET  /                      minimal HTML viewer page
  GET  /render?mode=RGB|Depth|Semantic|Relevancy
              &x=&y=&z=&yaw=&pitch=      camera pose (orbit params), OR
              &quat=w,x,y,z&pos=x,y,z    client camera pose (viser wxyz
                                         convention, view_viser.py:256-268), OR
              &pose=16 floats            full row-major camera-to-world
              &w=&h=&fov=                resolution / vertical fov (radians)
              &prompts=a,b,c             Semantic/Relevancy prompts
              &t=                        dynamic-scene timestep, OR
              &play=1&fps=10             wall-clock replay (view_viser:173-180)
       -> PNG
  POST /edit   body: mode=Remove|Color|Size|Move&edit=a,b&preserve=c,d
  POST /reset  undo all edits

Usage:
    python view_server.py semantic_gaussians_tpu/config/yamls/view_scannet.yaml \
        model.model_dir=... [fusion.out_dir=...]
"""
import io
import json
import sys
import pathlib
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

_PAGE = """<!doctype html><title>semantic-gaussians viewer</title>
<body style="font-family:sans-serif">
<h3>semantic-gaussians-tpu viewer</h3>
<img id=v width=640><br>
mode <select id=m><option>RGB<option>Depth<option>Semantic<option>Relevancy</select>
prompts <input id=p value="wall,floor,chair,table" size=40>
yaw <input id=yaw type=range min=-3.14 max=3.14 step=0.05 value=0>
pitch <input id=pit type=range min=-1.5 max=1.5 step=0.05 value=0>
r <input id=r type=range min=0.5 max=10 step=0.1 value=3>
<script>
function u(){const yaw=+document.getElementById('yaw').value,
 p=+document.getElementById('pit').value,r=+document.getElementById('r').value;
 const x=r*Math.sin(yaw)*Math.cos(p),y=r*Math.sin(p),z=-r*Math.cos(yaw)*Math.cos(p);
 document.getElementById('v').src=`/render?mode=${document.getElementById('m').value}`+
 `&x=${x}&y=${y}&z=${z}&yaw=${yaw}&pitch=${p}&prompts=${document.getElementById('p').value}&_=${Date.now()}`;}
for(const id of ['m','p','yaw','pit','r'])document.getElementById(id).oninput=u;u();
</script>"""


class ViewerState:
    def __init__(self, cfg):
        import jax

        from semantic_gaussians_tpu.io.ply import load_gaussian_ply
        from semantic_gaussians_tpu.io.dynamic_npz import load_dynamic_npz
        from semantic_gaussians_tpu.models.predictors import RandomFeatureProvider
        from semantic_gaussians_tpu.pipelines.fusion import load_fused_features
        from semantic_gaussians_tpu.utils.checkpoint import latest_iteration

        import time

        self.cfg = cfg
        self._start_time = time.time()
        self.dynamic = None
        model_dir = pathlib.Path(cfg.model.model_dir)
        if cfg.model.get("dynamic"):
            self.dynamic = load_dynamic_npz(model_dir / "params.npz")
            self.params, self.alive = self.dynamic.params_at(0)
        else:
            it = cfg.model.get("load_iteration", -1)
            if it == -1:
                it = latest_iteration(model_dir / "point_cloud")
            ply = model_dir / "point_cloud" / f"iteration_{it}" / "point_cloud.ply"
            self.params, self.alive = load_gaussian_ply(ply)
        self.original_params = self.params
        dim = int(cfg.fusion.get("embedding_dim", 768) if cfg.get("fusion") else 768)
        self.text_encoder = RandomFeatureProvider(dim)
        self.gauss_feats = None
        if cfg.get("fusion") and cfg.fusion.get("out_dir"):
            fused = sorted(pathlib.Path(cfg.fusion.out_dir).glob("**/*.pt"))
            if fused:
                self.gauss_feats, _ = load_fused_features(
                    fused[0], capacity=self.params.capacity
                )

    def set_text_encoder(self, enc):
        self.text_encoder = enc

    def render(self, q):
        import math
        import time

        from semantic_gaussians_tpu.pipelines.viewer import render_view
        from semantic_gaussians_tpu.utils.camera import make_camera_from_c2w

        mode = q.get("mode", ["RGB"])[0]
        w = int(q.get("w", [640])[0])
        h = int(q.get("h", [480])[0])
        fov = float(q.get("fov", [1.2])[0])
        params = self.params
        if self.dynamic is not None:
            # wall-clock replay (view_viser.py:173-180): with play=1 the
            # timestep advances by elapsed time * fps; explicit t overrides.
            if q.get("play", ["0"])[0] not in ("0", ""):
                fps = float(q.get("fps", [10.0])[0])
                t = int(
                    (time.time() - self._start_time)
                    * fps
                    % self.dynamic.num_timesteps
                )
            else:
                t = int(q.get("t", [0])[0]) % self.dynamic.num_timesteps
            params, _ = self.dynamic.params_at(t)

        if "quat" in q or "pose" in q:
            # Client-pose protocol (view_viser.py:256-268): camera-to-world
            # from a wxyz quaternion + position (viser client convention) or
            # a full 16-float row-major c2w matrix; fov is vertical, fov_x
            # follows the aspect (get_camera_viser, camera_utils.py:89-103).
            if "pose" in q:
                c2w = np.asarray(
                    [float(v) for v in q["pose"][0].split(",")], np.float64
                ).reshape(4, 4)
            else:
                qw, qx, qy, qz = (float(v) for v in q["quat"][0].split(","))
                px, py, pz = (
                    float(v) for v in q.get("pos", ["0,0,0"])[0].split(",")
                )
                n = math.sqrt(qw * qw + qx * qx + qy * qy + qz * qz) or 1.0
                qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
                R = np.array(
                    [
                        [
                            1 - 2 * (qy * qy + qz * qz),
                            2 * (qx * qy - qw * qz),
                            2 * (qx * qz + qw * qy),
                        ],
                        [
                            2 * (qx * qy + qw * qz),
                            1 - 2 * (qx * qx + qz * qz),
                            2 * (qy * qz - qw * qx),
                        ],
                        [
                            2 * (qx * qz - qw * qy),
                            2 * (qy * qz + qw * qx),
                            1 - 2 * (qx * qx + qy * qy),
                        ],
                    ]
                )
                c2w = np.eye(4)
                c2w[:3, :3] = R
                c2w[:3, 3] = [px, py, pz]
            fov_y = fov
            fov_x = 2.0 * math.atan(math.tan(fov_y / 2.0) * w / h)
            cam = make_camera_from_c2w(c2w, fov_x, fov_y, w, h)
        else:
            x = float(q.get("x", [0])[0])
            y = float(q.get("y", [0])[0])
            z = float(q.get("z", [-3])[0])
            yaw = float(q.get("yaw", [0])[0])
            pitch = float(q.get("pitch", [0])[0])
            cy, sy = math.cos(yaw), math.sin(yaw)
            cp, sp = math.cos(pitch), math.sin(pitch)
            ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
            c2w = np.eye(4)
            c2w[:3, :3] = ry @ rx
            c2w[:3, 3] = [x, y, z]
            cam = make_camera_from_c2w(c2w, fov, fov * h / w, w, h)
        prompts = [
            p for p in q.get("prompts", [""])[0].split(",") if p.strip()
        ]
        return render_view(
            cam, params, self.alive, mode=mode,
            gauss_feats=self.gauss_feats, text_encoder=self.text_encoder,
            prompts=prompts, backend=self.cfg.render.get("backend", "pallas"),
        )

    def edit(self, q):
        import jax.numpy as jnp

        from semantic_gaussians_tpu.pipelines.viewer import (
            apply_edit,
            select_by_text,
        )

        if self.gauss_feats is None:
            return {"error": "no semantic features loaded"}
        mode = q.get("mode", ["Remove"])[0]
        edit = [p for p in q.get("edit", [""])[0].split(",") if p.strip()]
        preserve = [
            p for p in q.get("preserve", [""])[0].split(",") if p.strip()
        ]
        mask = select_by_text(
            jnp.asarray(self.gauss_feats), self.text_encoder, edit, preserve
        )
        self.params = apply_edit(self.params, mask, mode)
        return {"edited": int(np.asarray(mask).sum()), "mode": mode}

    def reset(self):
        self.params = self.original_params
        return {"reset": True}


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            q = urllib.parse.parse_qs(url.query)
            if url.path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif url.path == "/render":
                try:
                    img = state.render(q)
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, "PNG")
                    self._send(200, buf.getvalue(), "image/png")
                except Exception as e:  # surface errors to the client
                    self._send(500, json.dumps({"error": str(e)}).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            url = urllib.parse.urlparse(self.path)
            length = int(self.headers.get("Content-Length", 0))
            q = urllib.parse.parse_qs(self.rfile.read(length).decode())
            if url.path == "/edit":
                self._send(200, json.dumps(state.edit(q)).encode())
            elif url.path == "/reset":
                self._send(200, json.dumps(state.reset()).encode())
            else:
                self._send(404, b"{}")

    return Handler


def main():
    import jax

    from semantic_gaussians_tpu.utils.platform import setup_backend

    setup_backend()  # SGTPU_PLATFORM=cpu escape hatch + TPU compile cache

    from semantic_gaussians_tpu.config.config import load_config, pretty

    cfg = load_config(sys.argv[1])
    print(pretty(cfg))
    state = ViewerState(cfg)
    port = int(cfg.render.get("port", 8080))
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"viewer at http://localhost:{port}/")
    server.serve_forever()


if __name__ == "__main__":
    main()
