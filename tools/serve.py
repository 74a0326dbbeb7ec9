#!/usr/bin/env python
"""HTTP serving app for text/image-to-video generation.

The serving-surface equivalent of the reference's Gradio apps (`app.py`,
`app_multigpu.py` + `scripts/app_multigpu_engine.py`): models load once at
startup (the reference's per-variant model cache + lock, `app.py:14-17,
128-146`, becomes a single resident pipeline + a request lock), and
multi-chip inference is a mesh config instead of a torchrun subprocess.

Endpoints (JSON in, binary out):
  POST /generate    {"prompt": ..., "temp": 16, "height": 384, "width": 640,
                     "guidance_scale": 7.0, "video_guidance_scale": 5.0,
                     "seed": 0}
                    -> video/mp4 (or application/x-npz frame stack)
  GET  /healthz     -> {"status": "ok", "devices": N}

Run: python tools/serve.py --model_path /ckpts/pyramid-flow-miniflux --port 7860
"""

import argparse
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE = {}
LOCK = threading.Lock()  # one generation at a time per chip


def build_pipeline(args):
    import jax.numpy as jnp
    from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
    from pyramid_flow_tpu.models.mmdit.model import MMDiTConfig, PyramidDiffusionMMDiT
    from pyramid_flow_tpu.models.text.encoder import FluxTextEncoder, SD3TextEncoder
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline
    from pyramid_flow_tpu.utils.checkpoint import load_pretrained_components

    comps = load_pretrained_components(args.model_path, args.variant,
                                       args.model_name)
    dtype = jnp.bfloat16
    mesh = None
    if getattr(args, "sp", 1) > 1:
        # multi-chip sequence-parallel serving (the reference's
        # app_multigpu.py torchrun engine becomes a mesh config)
        from pyramid_flow_tpu.parallel.mesh import MeshConfig, make_mesh
        mesh = make_mesh(MeshConfig(dp=1, fsdp=1, sp=args.sp))
    if args.model_name == "pyramid_flux":
        dit = PyramidFluxTransformer(config=FluxConfig(), dtype=dtype,
                                     mesh=mesh)
        te = FluxTextEncoder(comps["clip"], comps["t5"], args.model_path,
                             dtype=dtype)
    else:
        dit = PyramidDiffusionMMDiT(config=MMDiTConfig(), dtype=dtype,
                                    mesh=mesh)
        te = SD3TextEncoder(comps["clip"], comps["clip_g"], comps["t5"],
                            args.model_path, dtype=dtype)
    vae = CausalVideoVAE(config=VAEConfig(), dtype=dtype)
    pipe = PyramidFlowPipeline(dit, comps["dit"], vae, comps.get("vae"),
                               model_name=args.model_name, dtype=dtype)
    STATE.update(pipe=pipe, te=te)


def generate(req: dict) -> bytes:
    import jax
    import numpy as np

    pipe, te = STATE["pipe"], STATE["te"]
    prompt = req.get("prompt", "") + ", hyper quality, Ultra HD, 8K"
    neg = req.get("negative_prompt",
                  "cartoon style, worst quality, low quality, blurry")
    emb, mask, pooled = te(prompt)
    nemb, nmask, npooled = te(neg)
    kwargs = dict(
        height=int(req.get("height", 384)), width=int(req.get("width", 640)),
        temp=int(req.get("temp", 16)),
        num_inference_steps=int(req.get("num_inference_steps", 20)),
        video_num_inference_steps=int(req.get("video_num_inference_steps", 10)),
        guidance_scale=float(req.get("guidance_scale", 7.0)),
        video_guidance_scale=float(req.get("video_guidance_scale", 5.0)),
        output_type="pixels",
    )
    rng = jax.random.PRNGKey(int(req.get("seed", 0)))
    if req.get("image"):
        # image-to-video: "image" = base64 PNG/JPEG, resized to (height, width)
        # (the reference app's I2V tab, app.py:171-243)
        import base64

        from PIL import Image

        from pyramid_flow_tpu.models.vae.model import (
            chunk_encode, gaussian_sample)

        img = Image.open(io.BytesIO(base64.b64decode(req["image"])))
        img = img.convert("RGB").resize((kwargs["width"], kwargs["height"]))
        px = (np.asarray(img, np.float32) / 127.5 - 1.0)[None, None]
        moments = chunk_encode(pipe.vae, pipe.vae_params, jax.numpy.asarray(px))
        rng, sub = jax.random.split(rng)
        latent = gaussian_sample(moments, sub)
        frames = pipe.generate_i2v(
            rng, latent, emb, mask, pooled, nemb, nmask, npooled, **kwargs)
    else:
        frames = pipe.generate(
            rng, emb, mask, pooled, nemb, nmask, npooled, **kwargs)
    frames = np.asarray(frames)[0]
    buf = io.BytesIO()
    try:
        import imageio
        imageio.mimwrite(buf, list(frames), format="mp4",
                         fps=int(req.get("fps", 24)))
        return buf.getvalue(), "video/mp4"
    except Exception:
        np.savez_compressed(buf, frames=frames)
        return buf.getvalue(), "application/x-npz"


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *a):
        print(f"[serve] {fmt % a}", file=sys.stderr)

    def _send(self, code, body, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            import jax
            self._send(200, json.dumps(
                {"status": "ok", "devices": len(jax.devices())}).encode())
        else:
            self._send(404, b"{}")

    def do_POST(self):
        if self.path != "/generate":
            return self._send(404, b"{}")
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            t0 = time.time()
            with LOCK:
                body, ctype = generate(req)
            print(f"[serve] generated in {time.time()-t0:.1f}s", file=sys.stderr)
            self._send(200, body, ctype)
        except Exception as e:  # surface errors as JSON
            self._send(500, json.dumps({"error": str(e)}).encode())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--variant", default="diffusion_transformer_384p")
    p.add_argument("--model_name", default="pyramid_flux")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree (multi-chip serving)")
    args = p.parse_args()

    print("loading models ...", file=sys.stderr)
    build_pipeline(args)
    print(f"serving on {args.host}:{args.port}", file=sys.stderr)
    ThreadingHTTPServer((args.host, args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
