"""Interactive Gaussian splat viewer (web-based).

Replacement for the reference's DearPyGui viewer (ref: gui.py:18-294;
DearPyGui is not available here): a stdlib HTTP server renders one view
per request through the batched splat renderer and a small HTML page
provides mouse orbit / scroll zoom / sliders. The per-frame render time
is measured server-side and surfaced in an ``X-Render-Ms`` header; the
page overlays ms + FPS exactly like the reference's instrumentation
(ref: gui.py:100-104).

Run: python -m lgm_tpu.apps.viewer model.ply --port 7860 --size 512
"""

from __future__ import annotations

import argparse
import functools
import io
import json
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>lgm_tpu viewer</title><style>
 body { margin:0; background:#111; color:#eee; font-family:monospace; }
 #hud { position:fixed; top:8px; left:8px; background:#0008; padding:6px; }
 #view { display:block; margin:auto; cursor:grab; }
 label { margin-right: 12px; }
</style></head><body>
<div id="hud">
  <div id="stats">-</div>
  <label>mode <select id="mode"><option>image</option><option>alpha</option>
  <option>depth</option></select></label>
  <label>fovy <input id="fovy" type="range" min="20" max="90" value="49.1"
   step="0.1"></label>
  <label>scale <input id="scale" type="range" min="0.05" max="2" value="1"
   step="0.05"></label>
</div>
<img id="view" width="__SIZE__" height="__SIZE__"/>
<script>
let el=0, az=0, radius=1.5, busy=false, drag=0, lx=0, ly=0, pan=[0,0];
const img=document.getElementById('view');
const stats=document.getElementById('stats');
async function refresh(){
  if(busy) return; busy=true;
  const t0=performance.now();
  const q=new URLSearchParams({el:el,az:az,radius:radius,
    panx:pan[0],pany:pan[1],
    fovy:document.getElementById('fovy').value,
    scale:document.getElementById('scale').value,
    mode:document.getElementById('mode').value});
  const r=await fetch('/render?'+q);
  const ms=r.headers.get('X-Render-Ms');
  const b=await r.blob();
  img.src=URL.createObjectURL(b);
  const total=performance.now()-t0;
  stats.textContent=`render ${Number(ms).toFixed(2)}ms `+
    `(${(1000/Number(ms)).toFixed(0)} FPS) | round-trip `+
    `${total.toFixed(0)}ms | el ${el.toFixed(1)} az ${az.toFixed(1)} `+
    `r ${radius.toFixed(2)}`;
  busy=false;
}
img.onmousedown=e=>{
  drag=(e.button===2||e.button===1||e.shiftKey)?2:1;
  lx=e.clientX;ly=e.clientY;e.preventDefault();};
img.oncontextmenu=e=>e.preventDefault();
window.onmouseup=()=>drag=0;
window.onmousemove=e=>{ if(!drag) return;
  const dx=e.clientX-lx, dy=e.clientY-ly;
  if(drag===2){ // pan: right/middle/shift-drag, like gui.py:219-243
    const s=0.002*radius; pan[0]-=dx*s; pan[1]+=dy*s;
  } else { az-=dx*0.4; el+=dy*0.4; el=Math.max(-89,Math.min(89,el)); }
  lx=e.clientX; ly=e.clientY; refresh();};
img.onwheel=e=>{e.preventDefault();
  radius=Math.max(0.3,Math.min(5,radius*(1+e.deltaY*0.001))); refresh();};
document.getElementById('fovy').oninput=refresh;
document.getElementById('scale').oninput=refresh;
document.getElementById('mode').oninput=refresh;
refresh();
</script></body></html>"""


class ViewerState:
    def __init__(self, gaussians: np.ndarray, size: int = 512,
                 znear: float = 0.5, zfar: float = 2.5):
        import jax
        import jax.numpy as jnp

        from lgm_tpu.ops.gsplat import render_views

        self.size = size
        self.znear, self.zfar = znear, zfar
        self.gaussians = jnp.asarray(gaussians)[None]

        @functools.partial(jax.jit, static_argnums=())
        def _render(g, cam_view, tan, scale):
            return render_views(
                g, cam_view, size, tan, scale_modifier=scale,
                dup=32,  # quality over speed off the training path
            )

        self._render = _render

    def frame(self, el, az, radius, fovy, scale, mode,
              panx=0.0, pany=0.0) -> np.ndarray:
        import jax.numpy as jnp

        from lgm_tpu.utils import camera

        # Pan shifts the orbit target in the camera's screen plane
        # (world-unit offsets along the camera right/up axes), matching
        # the reference GUI's middle-drag pan (ref: gui.py:219-243).
        target = np.zeros(3, np.float32)
        if panx or pany:
            base = camera.orbit_camera(el, az, radius)
            target = base[:3, 0] * panx + base[:3, 1] * pany
        pose = camera.orbit_camera(el, az, radius, target=target)
        cams = camera.build_camera_inputs(pose[None], fovy, self.znear,
                                          self.zfar)
        tan = float(np.tan(0.5 * np.deg2rad(fovy)))
        out = self._render(
            self.gaussians, jnp.asarray(cams["cam_view"])[None], tan,
            float(scale),
        )
        if mode == "alpha":
            a = np.asarray(out["alpha"][0, 0, :, :, 0])
            return np.repeat(a[..., None], 3, axis=-1)
        if mode == "depth" and "depth" not in out:
            # Never silently fall through to RGB (a user would mistake it
            # for depth): mid-gray frame with a dark band signals
            # "depth unavailable on this backend".
            frame = np.full((self.size, self.size, 3), 0.5, np.float32)
            frame[self.size // 2 - 8:self.size // 2 + 8] = 0.1
            return frame
        if mode == "depth":
            # Alpha-normalized depth, mapped to [0,1] over [znear, zfar]
            # (the mode the reference GUI lacks; enabled by the
            # rasterizer's depth channel).
            a = np.asarray(out["alpha"][0, 0, :, :, 0])
            d = np.asarray(out["depth"][0, 0, :, :, 0])
            d = np.where(a > 1e-3, d / np.maximum(a, 1e-6), self.zfar)
            d = 1.0 - np.clip(
                (d - self.znear) / (self.zfar - self.znear), 0, 1
            )
            return np.repeat(d[..., None], 3, axis=-1)
        return np.asarray(out["image"][0, 0])


def _make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path == "/":
                body = _PAGE.replace("__SIZE__", str(state.size)).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path == "/render":
                q = dict(urllib.parse.parse_qsl(url.query))
                t0 = time.perf_counter()
                img = state.frame(
                    float(q.get("el", 0)), float(q.get("az", 0)),
                    float(q.get("radius", 1.5)),
                    float(q.get("fovy", 49.1)),
                    float(q.get("scale", 1.0)), q.get("mode", "image"),
                    panx=float(q.get("panx", 0)),
                    pany=float(q.get("pany", 0)),
                )
                ms = (time.perf_counter() - t0) * 1e3
                import cv2

                ok, buf = cv2.imencode(
                    ".jpg",
                    (np.clip(img, 0, 1)[..., ::-1] * 255).astype(np.uint8),
                )
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("X-Render-Ms", f"{ms:.3f}")
                self.end_headers()
                self.wfile.write(buf.tobytes())
                return
            self.send_response(404)
            self.end_headers()

    return Handler


def serve(gaussians: np.ndarray, port: int = 7860, size: int = 512):
    state = ViewerState(gaussians, size=size)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), _make_handler(state))
    print(f"viewer on http://localhost:{port} ({size}x{size})")
    httpd.serve_forever()


def main(argv=None):
    from lgm_tpu.io.ply import load_ply

    parser = argparse.ArgumentParser(description="gaussian splat viewer")
    parser.add_argument("ply")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--size", type=int, default=512)
    ns = parser.parse_args(argv)
    serve(load_ply(ns.ply), port=ns.port, size=ns.size)


if __name__ == "__main__":
    main()
