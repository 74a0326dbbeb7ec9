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
                     "seed": 0, "variant": "diffusion_transformer_384p"}
                    -> video/mp4 (or application/x-npz frame stack)
  GET  /progress    -> live per-unit progress of the in-flight generation
                       (the reference app's Gradio progress callbacks,
                       `app.py:186-243`, as a curl-able JSON endpoint)
  GET  /            -> minimal browser UI (prompt box + progress bar + video)
  GET  /healthz     -> {"status": "ok", "devices": N}

Pipelines are cached per model variant and loaded on demand (the
reference's per-variant model cache + lock, `app.py:14-17,128-146`).

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
PIPELINES = {}  # variant -> PyramidFlowPipeline (reference app.py:14-17)
LOCK = threading.Lock()  # one generation at a time per chip
PROGRESS = {"status": "idle"}
PROGRESS_LOCK = threading.Lock()


def _set_progress(**kw):
    with PROGRESS_LOCK:
        PROGRESS.clear()
        PROGRESS.update(kw)


def _update_progress(info):
    with PROGRESS_LOCK:
        PROGRESS.update(info)
        started = PROGRESS.get("started")
        if started:
            PROGRESS["elapsed_s"] = round(time.time() - started, 1)


def build_pipeline(args, variant=None):
    """Load (or fetch cached) pipeline for a variant; text encoder + VAE are
    shared across variants (reference model cache, `app.py:128-146`)."""
    variant = variant or args.variant
    if variant in PIPELINES:
        return PIPELINES[variant]

    import jax.numpy as jnp
    from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
    from pyramid_flow_tpu.models.mmdit.model import MMDiTConfig, PyramidDiffusionMMDiT
    from pyramid_flow_tpu.models.text.encoder import FluxTextEncoder, SD3TextEncoder
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline
    from pyramid_flow_tpu.utils.checkpoint import load_pretrained_components

    # HBM-bounded cache (evict BEFORE loading the new weights): on a 16 GB
    # chip two resident ~5.8 GB DiT variants OOM mid-request, so other
    # variants are dropped unless there is headroom for this one plus the
    # serving working set (text encoder + activations).
    if PIPELINES:
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats() or {}
            # unknown capacity must mean "evict" (free=0), not "plenty":
            # backends that return {} would otherwise never evict and the
            # second resident DiT OOMs mid-request
            free = stats["bytes_limit"] - stats["bytes_in_use"]
        except Exception:
            free = 0.0
        if free < 8e9:
            evicted = sorted(PIPELINES)
            PIPELINES.clear()  # params freed once in-flight requests release
            print(f"serve: evicted variants {evicted} to fit '{variant}' "
                  f"(free HBM {free/1e9:.1f} GB)", file=sys.stderr)

    comps = load_pretrained_components(args.model_path, variant,
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
        if "te" not in STATE:
            STATE["te"] = FluxTextEncoder(comps["clip"], comps["t5"],
                                          args.model_path, dtype=dtype)
    else:
        dit = PyramidDiffusionMMDiT(config=MMDiTConfig(), dtype=dtype,
                                    mesh=mesh)
        if "te" not in STATE:
            STATE["te"] = SD3TextEncoder(comps["clip"], comps["clip_g"],
                                         comps["t5"], args.model_path,
                                         dtype=dtype)
    vae = CausalVideoVAE(config=VAEConfig(), dtype=dtype)
    pipe = PyramidFlowPipeline(dit, comps["dit"], vae, comps.get("vae"),
                               model_name=args.model_name, dtype=dtype)
    PIPELINES[variant] = pipe
    return pipe


def build_debug_tiny():
    """Tiny random-weight pipeline + hash tokenizer: makes the full serving
    surface (endpoints, progress, browser UI) drivable without released
    checkpoints. Output is noise — this is a plumbing/demo mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyramid_flow_tpu.models.flux.model import (
        FluxConfig, PyramidFluxTransformer)
    from pyramid_flow_tpu.models.text.clip import CLIPTextConfig
    from pyramid_flow_tpu.models.text.encoder import FluxTextEncoder
    from pyramid_flow_tpu.models.text.t5 import T5Config
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline

    class HashTokenizer:
        model_max_length = 16

        def __call__(self, prompts, padding=None, max_length=16,
                     truncation=True, return_tensors="np"):
            max_length = min(max_length, 16)
            ids = np.zeros((len(prompts), max_length), np.int32)
            mask = np.zeros((len(prompts), max_length), np.int32)
            for i, p in enumerate(prompts):
                toks = ([3 + (hash(w) % 100) for w in p.split()]
                        [: max_length - 1] + [2])
                ids[i, : len(toks)] = toks
                mask[i, : len(toks)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    dit_cfg = FluxConfig(
        in_channels=16, num_layers=1, num_single_layers=1,
        attention_head_dim=8, num_attention_heads=4, joint_attention_dim=32,
        pooled_projection_dim=24, axes_dims_rope=(4, 2, 2))
    dit = PyramidFluxTransformer(config=dit_cfg, dtype=jnp.float32)
    dit_params = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)), jnp.zeros((1, 16, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.zeros((1, 8, 32)),
        jnp.ones((1, 8), bool), jnp.zeros((1, 24)), jnp.zeros((1,)))
    vae_cfg = VAEConfig(latent_channels=4, block_out_channels=(8, 8, 16, 16),
                        encoder_layers_per_block=(1, 1, 1, 1),
                        decoder_layers_per_block=(1, 1, 1, 1), num_groups=4)
    vae = CausalVideoVAE(config=vae_cfg)
    vae_params = vae.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 1, 32, 32, 3)),
                          rng=jax.random.PRNGKey(2))
    pipe = PyramidFlowPipeline(dit, dit_params, vae, vae_params,
                               latent_channels=4, dtype=jnp.float32)
    te = FluxTextEncoder(
        clip_params=None, t5_params=None,
        clip_config=CLIPTextConfig(vocab_size=128, hidden_size=24,
                                   intermediate_size=48, num_layers=1,
                                   num_heads=4, eos_token_id=2),
        t5_config=T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                           num_layers=1, num_heads=4),
        tokenizers=(HashTokenizer(), HashTokenizer()),
        max_sequence_length=8, dtype=jnp.float32)
    te.clip_params = te.clip.init(jax.random.PRNGKey(3),
                                  jnp.zeros((1, 16), jnp.int32))
    te.t5_params = te.t5.init(jax.random.PRNGKey(4),
                              jnp.zeros((1, 8), jnp.int32),
                              jnp.ones((1, 8), jnp.int32))
    STATE.update(pipe=pipe, te=te)


def generate(req: dict) -> bytes:
    import jax
    import numpy as np

    temp = int(req.get("temp", 16))
    _set_progress(status="running", phase="load_model", unit=0,
                  units=1 + max(temp - 1, 0), started=time.time(),
                  prompt=req.get("prompt", "")[:80])
    if req.get("variant") is None and "pipe" in STATE:
        pipe = STATE["pipe"]  # direct injection (tests / --debug_tiny)
    elif req.get("variant") and getattr(STATE.get("args"), "model_path",
                                        None) is None:
        raise ValueError(
            "request specifies a model variant but the server has no "
            "--model_path (running --debug_tiny?)")
    else:
        pipe = build_pipeline(STATE["args"], req.get("variant"))
    te = STATE["te"]
    prompt = req.get("prompt", "") + ", hyper quality, Ultra HD, 8K"
    neg = req.get("negative_prompt",
                  "cartoon style, worst quality, low quality, blurry")
    _update_progress({"phase": "text_encode"})
    emb, mask, pooled = te(prompt)
    nemb, nmask, npooled = te(neg)
    kwargs = dict(
        height=int(req.get("height", 384)), width=int(req.get("width", 640)),
        temp=temp,
        num_inference_steps=int(req.get("num_inference_steps", 20)),
        video_num_inference_steps=int(req.get("video_num_inference_steps", 10)),
        guidance_scale=float(req.get("guidance_scale", 7.0)),
        video_guidance_scale=float(req.get("video_guidance_scale", 5.0)),
        output_type="pixels",
        progress_callback=_update_progress,
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


INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>Pyramid Flow (TPU)</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:720px;margin:2rem auto;padding:0 1rem}
 textarea,input,select{width:100%;box-sizing:border-box;margin:.25rem 0;padding:.4rem}
 button{padding:.5rem 1.5rem;margin-top:.5rem}
 #bar{height:10px;background:#e0e0e0;border-radius:5px;overflow:hidden;margin:.75rem 0}
 #fill{height:100%;width:0;background:#4a7;transition:width .3s}
 #status{color:#555;font-size:.9rem}
 video,img{max-width:100%;margin-top:1rem}
 .row{display:flex;gap:.5rem}.row>*{flex:1}
</style></head><body>
<h2>Pyramid Flow &mdash; TPU serving</h2>
<textarea id="prompt" rows="2"
 placeholder="A movie trailer featuring the adventures of...">A movie trailer featuring the adventures of the 30 year old space man</textarea>
<div class="row">
 <label>temp <input id="temp" type="number" value="16" min="1" max="31"></label>
 <label>height <input id="h" type="number" value="384" step="64"></label>
 <label>width <input id="w" type="number" value="640" step="64"></label>
 <label>seed <input id="seed" type="number" value="0"></label>
</div>
<button id="go">Generate</button>
<div id="bar"><div id="fill"></div></div>
<div id="status">idle</div>
<div id="out"></div>
<script>
let poll = null;
document.getElementById('go').onclick = async () => {
  const req = {prompt: prompt.value, temp: +temp.value, height: +h.value,
               width: +w.value, seed: +seed.value};
  document.getElementById('go').disabled = true;
  poll = setInterval(async () => {
    const p = await (await fetch('/progress')).json();
    const frac = p.units ? (p.unit || 0) / p.units : 0;
    document.getElementById('fill').style.width = (100 * frac) + '%';
    document.getElementById('status').textContent =
      `${p.status || 'idle'} | ${p.phase || ''} | unit ${p.unit || 0}/` +
      `${p.units || '?'} | ${p.elapsed_s || 0}s`;
  }, 1000);
  try {
    const r = await fetch('/generate', {method: 'POST',
      headers: {'Content-Type': 'application/json'}, body: JSON.stringify(req)});
    if (!r.ok) throw new Error((await r.json()).error || r.status);
    const blob = await r.blob();
    const url = URL.createObjectURL(blob);
    document.getElementById('out').innerHTML = blob.type.includes('mp4')
      ? `<video controls autoplay loop src="${url}"></video>`
      : `<a href="${url}" download="frames.npz">download frames.npz</a>`;
    document.getElementById('fill').style.width = '100%';
  } catch (e) {
    document.getElementById('status').textContent = 'error: ' + e.message;
  } finally {
    clearInterval(poll);
    document.getElementById('go').disabled = false;
  }
};
</script></body></html>
"""


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
                {"status": "ok", "devices": len(jax.devices()),
                 "variants_loaded": sorted(PIPELINES)}).encode())
        elif self.path == "/progress":
            with PROGRESS_LOCK:
                body = json.dumps(PROGRESS).encode()
            self._send(200, body)
        elif self.path in ("/", "/index.html"):
            self._send(200, INDEX_HTML.encode(), "text/html; charset=utf-8")
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
            _update_progress({"status": "done", "phase": "done"})
            print(f"[serve] generated in {time.time()-t0:.1f}s", file=sys.stderr)
            self._send(200, body, ctype)
        except Exception as e:  # surface errors as JSON
            _update_progress({"status": "error", "error": str(e)})
            self._send(500, json.dumps({"error": str(e)}).encode())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--debug_tiny", action="store_true",
                   help="tiny random-weight pipeline (no checkpoints needed; "
                        "output is noise — plumbing/demo mode)")
    p.add_argument("--variant", default="diffusion_transformer_384p")
    p.add_argument("--model_name", default="pyramid_flux")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree (multi-chip serving)")
    args = p.parse_args()

    STATE["args"] = args
    print("loading models ...", file=sys.stderr)
    if args.debug_tiny:
        build_debug_tiny()
    elif args.model_path:
        build_pipeline(args)
    else:
        sys.exit("--model_path is required (or use --debug_tiny)")
    print(f"serving on {args.host}:{args.port}", file=sys.stderr)
    ThreadingHTTPServer((args.host, args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
