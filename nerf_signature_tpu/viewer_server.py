"""Interactive browser viewer: the TPU-native replacement for the reference's
dearpygui window (``nerf/gui.py``), usable over SSH.

A tiny dependency-free HTTP server wraps :class:`viewer.Viewer`:

  * the render/train loop runs in ONE background thread (JAX dispatch stays
    single-threaded); HTTP handlers only mutate camera / control state,
  * ``GET /``       — HTML page: drag to orbit, wheel to zoom, shift-drag to
                      pan, train start/stop button, fovy/bg controls
                      (the reference's panel surface, ``nerf/gui.py:156-427``),
  * ``GET /frame``  — latest rendered frame as JPEG + stats header,
  * ``POST /ctl``   — JSON control messages {orbit|scale|pan|train|set}.

The adaptive budgets (~500 ms train slice, ~200 ms render, ``gui.py:108,137``)
live in ``Viewer``; this module only schedules them.
"""

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .viewer import Viewer

_PAGE = """<!doctype html>
<html><head><title>tpu-ngp-signature viewer</title><style>
body{background:#111;color:#ddd;font-family:monospace;margin:16px}
#v{border:1px solid #444;cursor:grab}
button,input{background:#222;color:#ddd;border:1px solid #555;margin:2px}
#stats{white-space:pre}
</style></head><body>
<h3>tpu-ngp-signature</h3>
<img id="v" width="%(W)d" height="%(H)d"/>
<div>
 <button onclick="ctl({train:1})">start training</button>
 <button onclick="ctl({train:0})">stop</button>
 <button onclick="ctl({save:1})">save ckpt</button>
 <button onclick="ctl({mesh:1})">save mesh</button>
 fovy <input id="fovy" type="range" min="20" max="120" value="%(fovy)d"
   oninput="ctl({fovy:+this.value})"/>
 <button onclick="ctl({reset:1})">reset view</button>
</div>
<div>
 mode <select onchange="ctl({mode:this.value})">
   <option value="rgb">rgb</option><option value="depth">depth</option>
 </select>
 bg <select onchange="ctl({bg:+this.value})">
   <option value="1">white</option><option value="0">black</option>
   <option value="0.5">gray</option>
 </select>
 dt_gamma <input type="number" step="0.00390625" min="0" max="0.25"
   value="%(dt_gamma)g" style="width:7em"
   onchange="ctl({dt_gamma:+this.value})"/>
 max_steps <input type="number" step="16" min="16" max="2048"
   value="%(max_steps)d" style="width:6em"
   onchange="ctl({max_steps:+this.value})"/>
</div>
<div>
 crop
 x <input class="crop" id="cx0" type="range" min="-%(bound)g" max="%(bound)g"
   step="%(crop_step)g" value="-%(bound)g" oninput="crop()"/>
 <input class="crop" id="cx1" type="range" min="-%(bound)g" max="%(bound)g"
   step="%(crop_step)g" value="%(bound)g" oninput="crop()"/>
 y <input class="crop" id="cy0" type="range" min="-%(bound)g" max="%(bound)g"
   step="%(crop_step)g" value="-%(bound)g" oninput="crop()"/>
 <input class="crop" id="cy1" type="range" min="-%(bound)g" max="%(bound)g"
   step="%(crop_step)g" value="%(bound)g" oninput="crop()"/>
 z <input class="crop" id="cz0" type="range" min="-%(bound)g" max="%(bound)g"
   step="%(crop_step)g" value="-%(bound)g" oninput="crop()"/>
 <input class="crop" id="cz1" type="range" min="-%(bound)g" max="%(bound)g"
   step="%(crop_step)g" value="%(bound)g" oninput="crop()"/>
 <button onclick="clearCrop()">clear crop</button>
</div>
<div id="stats"></div>
<script>
const img=document.getElementById('v');let drag=0,px=0,py=0,shift=0;
img.onmousedown=e=>{drag=1;px=e.clientX;py=e.clientY;shift=e.shiftKey;e.preventDefault()};
window.onmouseup=()=>drag=0;
window.onmousemove=e=>{if(!drag)return;
 ctl(shift?{pan:[e.clientX-px,e.clientY-py]}:{orbit:[e.clientX-px,e.clientY-py]});
 px=e.clientX;py=e.clientY;};
img.onwheel=e=>{ctl({scale:e.deltaY>0?-1:1});e.preventDefault()};
function ctl(m){fetch('/ctl',{method:'POST',body:JSON.stringify(m)})}
function cv(id){return +document.getElementById(id).value}
function crop(){ctl({aabb:[cv('cx0'),cv('cy0'),cv('cz0'),
                           cv('cx1'),cv('cy1'),cv('cz1')]})}
function clearCrop(){
 for(const el of document.querySelectorAll('.crop'))
  el.value=el.id.endsWith('0')?el.min:el.max;
 ctl({aabb:null});}
async function tick(){
 try{const r=await fetch('/frame?'+Date.now());
  document.getElementById('stats').textContent=r.headers.get('X-Stats')||'';
  const b=await r.blob();const old=img.src;
  img.src=URL.createObjectURL(b);
  if(old.startsWith('blob:'))URL.revokeObjectURL(old);}catch(e){}
 setTimeout(tick,100);}
tick();
</script></body></html>"""


class ViewerServer:
    def __init__(self, trainer, train_loader=None, W=800, H=800, radius=2.0,
                 fovy=60.0, host="127.0.0.1", port=7007, max_spp=1):
        self.viewer = Viewer(trainer, train_loader, W=W, H=H, radius=radius,
                             fovy=fovy, max_spp=max_spp)
        self.host, self.port = host, port
        self.training = False
        self.frame = None          # latest JPEG bytes
        self.stats = ""
        self.lock = threading.Lock()
        self._stop = threading.Event()
        self._pending = []         # device-touching actions for _loop

    # -- the single JAX thread ------------------------------------------------
    def _loop(self):
        from PIL import Image

        while not self._stop.is_set():
            while True:
                with self.lock:  # _pending is fed from HTTP handler threads
                    if not self._pending:
                        break
                    action = self._pending.pop(0)
                try:
                    if action == "save":
                        path = self.viewer.trainer.save_checkpoint(full=True)
                        print(f"[viewer] checkpoint saved: {path}", flush=True)
                    elif action == "mesh":
                        import os
                        from .meshing import save_mesh
                        path = os.path.join(
                            self.viewer.trainer.workspace or ".", "mesh.ply"
                        )
                        save_mesh(self.viewer.model, path, resolution=128,
                                  threshold=10)
                        print(f"[viewer] mesh saved: {path}", flush=True)
                except Exception as e:
                    print(f"[viewer] {action} failed: {e}", flush=True)
            info = {}
            if self.training and self.viewer.train_loader is not None:
                info = self.viewer.train_steps()
                # the model moved under the camera — restart supersampling
                self.viewer.reset_accum()
            if (not self.training and self.viewer.spp >= self.viewer.max_spp
                    and self.viewer._accum is not None):
                time.sleep(0.05)  # converged static frame — idle, don't spin
            img, dt_ms = self.viewer.render_view()
            buf = io.BytesIO()
            Image.fromarray((img * 255).astype(np.uint8)).save(
                buf, "JPEG", quality=90
            )
            stats = (f"render {dt_ms:6.1f} ms  downscale "
                     f"{self.viewer.downscale:.2f}  spp "
                     f"{self.viewer.spp}/{self.viewer.max_spp}")
            if info:
                stats += (f" | train loss {info.get('loss', 0):.5f} "
                          f"({info.get('next_steps', 0)} steps/frame)")
            with self.lock:
                self.frame = buf.getvalue()
                self.stats = stats
            if not self.training:
                time.sleep(0.05)

    def _handle(self, msg):
        v = self.viewer
        if "orbit" in msg:
            v.cam.orbit(*msg["orbit"])
        if "pan" in msg:
            v.cam.pan(*msg["pan"])
        if "scale" in msg:
            v.cam.scale(msg["scale"])
        if "fovy" in msg:
            v.cam.fovy = float(msg["fovy"])
        if "reset" in msg:
            v.cam.rot = np.eye(3, dtype=np.float32)
            v.cam.center = np.zeros(3, np.float32)
        if "train" in msg:
            self.training = bool(msg["train"])
        if msg.get("mode") in ("rgb", "depth"):
            v.mode = msg["mode"]
        if "bg" in msg:
            v.bg_color = float(np.clip(msg["bg"], 0.0, 1.0))
        # march-parameter panel (ref gui.py dt_gamma/max_steps sliders);
        # rc is a frozen static config — replacing it recompiles the render
        # on the next frame, exactly like the reference re-launching kernels
        if "dt_gamma" in msg or "max_steps" in msg:
            import dataclasses
            m = v.model
            m.rc = dataclasses.replace(
                m.rc,
                dt_gamma=float(msg.get("dt_gamma", m.rc.dt_gamma)),
                max_steps=int(msg.get("max_steps", m.rc.max_steps)),
            )
            # renders go through the exactness view of rc (t_cull pinned 0)
            m.rc_eval = (dataclasses.replace(m.rc, t_cull=0.0)
                         if m.rc.t_cull else m.rc)
        # aabb crop sliders (ref gui.py:355-427): a dynamic [6] array — no
        # recompile per slider move; null clears back to the full bound
        if "aabb" in msg:
            v.model.set_aabb_crop(msg["aabb"])
            v.reset_accum()
        # save/mesh touch the device — queue them for the render thread so
        # JAX dispatch stays single-threaded (see _loop)
        if "save" in msg:
            with self.lock:
                self._pending.append("save")
        if "mesh" in msg:
            with self.lock:
                self._pending.append("mesh")

    def serve(self, blocking=True):
        server_self = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path.startswith("/frame"):
                    with server_self.lock:
                        frame, stats = server_self.frame, server_self.stats
                    if frame is None:
                        self.send_response(503)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("X-Stats", stats)
                    self.end_headers()
                    self.wfile.write(frame)
                else:
                    cam = server_self.viewer.cam
                    rc = server_self.viewer.model.rc
                    body = (_PAGE % {
                        "W": cam.W, "H": cam.H, "fovy": int(cam.fovy),
                        "dt_gamma": rc.dt_gamma, "max_steps": rc.max_steps,
                        "bound": rc.bound, "crop_step": rc.bound / 64.0,
                    }).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    msg = json.loads(self.rfile.read(n) or b"{}")
                    server_self._handle(msg)
                    self.send_response(204)
                except Exception:
                    self.send_response(400)
                self.end_headers()

        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()
        self.httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        print(f"[viewer] http://{self.host}:{self.port}", flush=True)
        if blocking:
            try:
                self.httpd.serve_forever()
            except KeyboardInterrupt:
                pass
            finally:
                self.stop()
        else:
            self.http_thread = threading.Thread(
                target=self.httpd.serve_forever, daemon=True
            )
            self.http_thread.start()

    def stop(self):
        self._stop.set()
        # join the render thread: letting a daemon thread die mid-XLA-dispatch
        # at interpreter exit aborts the process in the runtime's destructor
        if hasattr(self, "thread"):
            self.thread.join(timeout=60)
        if hasattr(self, "httpd"):
            self.httpd.shutdown()
