"""Browser spectrum/waterfall display served over plain HTTP.

Reference analogue: the Qt CPlotter widget (gui/plotter.cpp) — 2D spectrum
+ scrolling waterfall with click-to-tune and draggable demod filter edges
(gui/plotter.cpp:140-372).  Here a dependency-free http.server hosting a
canvas page; spectrum frames are *pushed* over Server-Sent Events (GET
/events) the moment the display path produces them (no polling), with
/spectrum.json kept as a pull fallback.  Tune clicks and filter-edge drags
POST back to the session; the bin→pixel max-hold mapping runs on-device
(pipeline/spectrum.screen_map), the page just draws rows.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>cutesdr-tpu</title><style>
body{background:#111;color:#ddd;font-family:monospace;margin:12px}
canvas{display:block;margin-top:4px;image-rendering:pixelated}
#bar{margin:6px 0}
</style></head><body>
<div id="bar">cutesdr-tpu — <span id="status">connecting…</span></div>
<canvas id="spec" width="1024" height="200"></canvas>
<canvas id="wf" width="1024" height="300"></canvas>
<table id="chlist" style="border-collapse:collapse;margin-top:6px"></table>
<script>
const spec = document.getElementById('spec'), wf = document.getElementById('wf');
const sctx = spec.getContext('2d'), wctx = wf.getContext('2d');
let view = {tune_hz:0, low_hz:-5000, hi_hz:5000, symmetric:false,
            sample_rate:2e6, min_db:-120, max_db:0};
function color(v){ // 0..1 -> waterfall palette
  const t=Math.max(0,Math.min(1,v));
  const r=Math.floor(255*Math.min(1,t*3-1.2>0?t*3-1.2:0));
  const g=Math.floor(255*Math.min(1,t*2.5-0.5>0?t*2.5-0.5:0));
  const b=Math.floor(255*Math.min(1,t*3));
  return [r,g,b];
}
const fx = f => (f/view.sample_rate + 0.5) * spec.width;   // freq -> px
const xf = x => (x/spec.width - 0.5) * view.sample_rate;   // px -> freq
function drawFrame(d){
  Object.assign(view, {tune_hz:d.tune_hz, low_hz:d.low_hz, hi_hz:d.hi_hz,
    symmetric:d.symmetric, sample_rate:d.sample_rate,
    min_db:d.min_db, max_db:d.max_db});
  document.getElementById('status').textContent =
    `fs=${d.sample_rate} Hz  tune=${(d.tune_hz/1e3).toFixed(3)} kHz  `+
    `filter ${d.low_hz}..${d.hi_hz} Hz  `+
    `S-meter=${d.smeter_db?.toFixed(1)??'n/a'} dB`;
  const n = d.db.length, W = spec.width, H = spec.height;
  sctx.fillStyle='#111'; sctx.fillRect(0,0,W,H);
  // demod passband shading + edge/center markers
  const x0 = fx(d.tune_hz + d.low_hz), x1 = fx(d.tune_hz + d.hi_hz);
  sctx.fillStyle='rgba(80,160,255,0.15)'; sctx.fillRect(x0,0,x1-x0,H);
  sctx.strokeStyle='#f44'; sctx.beginPath();
  sctx.moveTo(fx(d.tune_hz),0); sctx.lineTo(fx(d.tune_hz),H); sctx.stroke();
  sctx.strokeStyle='rgba(120,200,255,0.8)';
  for (const xe of [x0,x1]) { sctx.beginPath();
    sctx.moveTo(xe,0); sctx.lineTo(xe,H); sctx.stroke(); }
  sctx.strokeStyle='#4cf'; sctx.beginPath();
  for(let x=0;x<W;x++){
    const i=Math.floor(x*n/W);
    const y=(1-(d.db[i]-d.min_db)/(d.max_db-d.min_db))*H;
    if(x===0)sctx.moveTo(x,y);else sctx.lineTo(x,y);
  }
  sctx.stroke();
  // channel-bank markers + table
  if (d.channels && d.channels.length) {
    for (const c of d.channels) {
      const x = fx(c.tune_hz);
      sctx.strokeStyle = c.monitor ? '#fc0' : 'rgba(255,200,0,0.4)';
      sctx.beginPath(); sctx.moveTo(x,0); sctx.lineTo(x,12); sctx.stroke();
      sctx.fillStyle = sctx.strokeStyle;
      sctx.fillText(String(c.id), x+2, 10);
    }
    const tbl = document.getElementById('chlist');
    tbl.innerHTML = '<tr><th>ch</th><th>freq kHz</th><th>S dB</th>'+
      '<th>audio</th></tr>' +
      d.channels.map(c =>
        `<tr data-ch="${c.id}" style="cursor:pointer;${c.monitor?
          'color:#fc0':''}"><td>${c.id}${c.monitor?' ♪':''}</td>`+
        `<td>${(c.tune_hz/1e3).toFixed(3)}</td>`+
        `<td>${c.smeter_db.toFixed(1)}</td>`+
        `<td><canvas class="mini" data-ch="${c.id}" width="96" height="16">`+
        `</canvas></td></tr>`).join('');
    for (const row of tbl.querySelectorAll('tr[data-ch]'))
      row.onclick = () => post('/select', {channel:+row.dataset.ch});
    for (const cv of tbl.querySelectorAll('canvas.mini')) {
      const c = d.channels[+cv.dataset.ch];
      if (!c.spec) continue;
      const g = cv.getContext('2d'), W = cv.width, H = cv.height;
      g.fillStyle = '#222'; g.fillRect(0, 0, W, H);
      g.fillStyle = c.monitor ? '#fc0' : '#4cf';
      const bw = W / c.spec.length;
      c.spec.forEach((v, i) => {
        const h = Math.max(1, (v + 100) / 100 * H);   // -100..0 dB scale
        g.fillRect(i * bw, H - h, Math.max(1, bw - 1), h);
      });
    }
  }
  const img = wctx.getImageData(0,0,wf.width,wf.height-1);
  wctx.putImageData(img,0,1);
  const row = wctx.createImageData(wf.width,1);
  for(let x=0;x<wf.width;x++){
    const i=Math.floor(x*n/wf.width);
    const v=(d.db[i]-d.min_db)/(d.max_db-d.min_db);
    const [r,g,b]=color(v);
    row.data[4*x]=r; row.data[4*x+1]=g; row.data[4*x+2]=b; row.data[4*x+3]=255;
  }
  wctx.putImageData(row,0,0);
}
// --- push channel (SSE), with poll fallback ---
function connect(){
  const es = new EventSource('/events');
  es.onmessage = ev => drawFrame(JSON.parse(ev.data));
  es.onerror = () => { es.close();
    document.getElementById('status').textContent='reconnecting…';
    setTimeout(connect, 1000); };
}
connect();
// --- interactions: drag edges / drag center / click-to-tune ---
let drag = null, lastPost = 0;
const HIT = 6; // px
function hitTest(x){
  if (Math.abs(x - fx(view.tune_hz + view.low_hz)) < HIT) return 'low';
  if (Math.abs(x - fx(view.tune_hz + view.hi_hz)) < HIT) return 'hi';
  if (Math.abs(x - fx(view.tune_hz)) < HIT) return 'center';
  return null;
}
async function post(path, body){
  const now = Date.now();
  if (now - lastPost < 50) return;      // throttle drag updates
  lastPost = now;
  const r = await fetch(path, {method:'POST', body: JSON.stringify(body)});
  if (r.status === 200) { const d = await r.json(); Object.assign(view, d); }
}
spec.addEventListener('mousemove', ev=>{
  const h = drag || hitTest(ev.offsetX);
  spec.style.cursor = h ? (h==='center'?'grab':'col-resize') : 'crosshair';
  if (!drag) return;
  const f = xf(ev.offsetX);
  if (drag === 'center') post('/tune', {freq_hz: f});
  else if (drag === 'low') {
    let lo = f - view.tune_hz;
    post('/filter', {low_hz: lo, hi_hz: view.symmetric ? -lo : view.hi_hz});
  } else {
    let hi = f - view.tune_hz;
    post('/filter', {low_hz: view.symmetric ? -hi : view.low_hz, hi_hz: hi});
  }
});
spec.addEventListener('mousedown', ev=>{ drag = hitTest(ev.offsetX); });
window.addEventListener('mouseup', ev=>{
  if (drag === null && ev.target === spec)
    post('/tune', {freq_hz: xf(ev.offsetX)});
  drag = null;
});
</script></body></html>"""


class SpectrumServer:
    """Serves the page + spectrum frames; callbacks wire into a session.

    * ``update(db, smeter_db)`` publishes a frame: stored for /spectrum.json
      and pushed to every open /events (SSE) stream.
    * ``set_view(tune_hz=, low_hz=, hi_hz=, symmetric=)`` keeps the demod
      overlay in sync; POST /tune and /filter update it from the callbacks'
      return values (rounded / clamped by the session).
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 8765,
                 sample_rate: float = 2e6, min_db: float = -120.0,
                 max_db: float = 0.0, on_tune=None, on_filter=None,
                 on_select=None):
        self._db = np.full(1024, min_db, np.float32)
        self._smeter = None
        self._channels: list[dict] = []
        self.on_select = on_select
        self._cond = threading.Condition()
        self._seq = 0
        self._stopping = False
        self.sample_rate = sample_rate
        self.min_db, self.max_db = min_db, max_db
        self.on_tune = on_tune
        self.on_filter = on_filter
        self.view = {"tune_hz": 0.0, "low_hz": -5000.0, "hi_hz": 5000.0,
                     "symmetric": False}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, body: bytes, ctype: str, code: int = 200):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/":
                    self._send(_PAGE.encode(), "text/html")
                elif self.path == "/spectrum.json":
                    with outer._cond:
                        body = outer._frame_json()
                    self._send(body, "application/json")
                elif self.path == "/events":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    last = outer._seq - 1   # send the current frame at once
                    try:
                        while not outer._stopping:
                            with outer._cond:
                                outer._cond.wait_for(
                                    lambda: outer._seq != last
                                    or outer._stopping, timeout=1.0)
                                fresh = outer._seq != last
                                last = outer._seq
                                body = outer._frame_json() if fresh else None
                            if body is None:
                                self.wfile.write(b": keepalive\n\n")
                            else:
                                self.wfile.write(b"data: " + body + b"\n\n")
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError, OSError):
                        pass
                else:
                    self.send_error(404)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or "{}")
                if self.path == "/tune" and outer.on_tune:
                    if "freq_hz" in req:
                        freq = float(req["freq_hz"])
                    else:   # legacy 0..1 fraction of the displayed span
                        freq = ((float(req.get("fraction", 0.5)) - 0.5)
                                * outer.sample_rate)
                    applied = outer.on_tune(freq)
                    if applied is None:
                        applied = freq
                    with outer._cond:
                        outer.view["tune_hz"] = float(applied)
                    self._send(json.dumps({"tune_hz": float(applied)}).encode(),
                               "application/json")
                elif self.path == "/select" and outer.on_select:
                    applied = outer.on_select(int(req.get("channel", 0)))
                    self._send(json.dumps(
                        {"selected": int(applied)}).encode(),
                        "application/json")
                elif self.path == "/filter" and outer.on_filter:
                    lo = float(req.get("low_hz", outer.view["low_hz"]))
                    hi = float(req.get("hi_hz", outer.view["hi_hz"]))
                    applied = outer.on_filter(lo, hi)
                    if applied is None:
                        applied = (lo, hi)
                    with outer._cond:
                        outer.view["low_hz"] = float(applied[0])
                        outer.view["hi_hz"] = float(applied[1])
                    self._send(json.dumps(
                        {"low_hz": float(applied[0]),
                         "hi_hz": float(applied[1])}).encode(),
                        "application/json")
                else:
                    self.send_response(204)
                    self.end_headers()

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    def _frame_json(self) -> bytes:
        """Caller holds self._cond."""
        frame = {
            "db": [round(float(v), 1) for v in self._db],
            "sample_rate": self.sample_rate,
            "min_db": self.min_db, "max_db": self.max_db,
            "smeter_db": self._smeter,
            **self.view,
        }
        if self._channels:
            frame["channels"] = self._channels
        return json.dumps(frame).encode()

    def start(self) -> "SpectrumServer":
        self._thread.start()
        return self

    def update(self, db: np.ndarray, smeter_db: float | None = None,
               channels: list[dict] | None = None) -> None:
        with self._cond:
            self._db = np.asarray(db, np.float32)
            self._smeter = None if smeter_db is None else float(smeter_db)
            if channels is not None:
                self._channels = channels
            self._seq += 1
            self._cond.notify_all()

    def set_view(self, **kw) -> None:
        with self._cond:
            self.view.update(kw)
            self._seq += 1
            self._cond.notify_all()

    def stop(self) -> None:
        self._stopping = True
        with self._cond:
            self._cond.notify_all()
        self._server.shutdown()
        self._server.server_close()
