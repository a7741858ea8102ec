"""Browser spectrum/waterfall display served over plain HTTP.

Reference analogue: the Qt CPlotter widget (gui/plotter.cpp) — 2D spectrum
+ scrolling waterfall with click-to-tune.  Here a dependency-free
http.server hosting a canvas page that polls JSON spectrum frames; tune
clicks POST back to the session.  The bin→pixel max-hold mapping runs
on-device (pipeline/spectrum.screen_map); the page just draws rows.
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
<script>
const spec = document.getElementById('spec'), wf = document.getElementById('wf');
const sctx = spec.getContext('2d'), wctx = wf.getContext('2d');
function color(v){ // 0..1 -> waterfall palette
  const t=Math.max(0,Math.min(1,v));
  const r=Math.floor(255*Math.min(1,t*3-1.2>0?t*3-1.2:0));
  const g=Math.floor(255*Math.min(1,t*2.5-0.5>0?t*2.5-0.5:0));
  const b=Math.floor(255*Math.min(1,t*3));
  return [r,g,b];
}
async function tick(){
  try{
    const r = await fetch('/spectrum.json');
    const d = await r.json();
    document.getElementById('status').textContent =
      `fs=${d.sample_rate} Hz  S-meter=${d.smeter_db?.toFixed(1)??'n/a'} dB  `+
      `range ${d.min_db}..${d.max_db} dB`;
    const n = d.db.length, W = spec.width;
    sctx.fillStyle='#111'; sctx.fillRect(0,0,W,spec.height);
    sctx.strokeStyle='#4cf'; sctx.beginPath();
    for(let x=0;x<W;x++){
      const i=Math.floor(x*n/W);
      const y=(1-(d.db[i]-d.min_db)/(d.max_db-d.min_db))*spec.height;
      if(x===0)sctx.moveTo(x,y);else sctx.lineTo(x,y);
    }
    sctx.stroke();
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
  }catch(e){ document.getElementById('status').textContent='disconnected'; }
  setTimeout(tick, 100);
}
spec.addEventListener('click', async ev=>{
  const fr = ev.offsetX/spec.width;
  await fetch('/tune', {method:'POST', body: JSON.stringify({fraction:fr})});
});
tick();
</script></body></html>"""


class SpectrumServer:
    """Serves the page + latest spectrum; callbacks wire into a session."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8765,
                 sample_rate: float = 2e6, min_db: float = -120.0,
                 max_db: float = 0.0, on_tune=None):
        self._db = np.full(1024, min_db, np.float32)
        self._smeter = None
        self._lock = threading.Lock()
        self.sample_rate = sample_rate
        self.min_db, self.max_db = min_db, max_db
        self.on_tune = on_tune
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path == "/":
                    body = _PAGE.encode()
                    ctype = "text/html"
                elif self.path == "/spectrum.json":
                    with outer._lock:
                        body = json.dumps({
                            "db": [round(float(v), 1) for v in outer._db],
                            "sample_rate": outer.sample_rate,
                            "min_db": outer.min_db, "max_db": outer.max_db,
                            "smeter_db": outer._smeter,
                        }).encode()
                    ctype = "application/json"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path == "/tune" and outer.on_tune:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or "{}")
                    frac = float(req.get("fraction", 0.5))
                    freq = (frac - 0.5) * outer.sample_rate
                    outer.on_tune(freq)
                self.send_response(204)
                self.end_headers()

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    def start(self) -> "SpectrumServer":
        self._thread.start()
        return self

    def update(self, db: np.ndarray, smeter_db: float | None = None) -> None:
        with self._lock:
            self._db = np.asarray(db, np.float32)
            self._smeter = None if smeter_db is None else float(smeter_db)

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
