"""In-browser world viewer — a zero-dependency alternative to matplotlib.

`python -m madrona_bots_tpu.viz.web [--num_worlds N] [--port P]` serves a
canvas page that polls the sim state as JSON and renders agents (colored by
species, sized by health), food packages, and the selected agent's
depth/semantic sensor strips — the same panel the reference's ImGui viewer
draws (gfx.cpp:214-318). Arrow keys switch world/agent; W/S/R/F/Space/B
drive the selected agent exactly like the reference keyboard scheme
(gfx.cpp:176-205), sent to SimManager.set_action.

Pure stdlib (http.server + JSON polling): no websockets, no npm, works over
a plain SSH port-forward.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>madrona_bots_tpu</title><style>
 body { background:#111; color:#ddd; font-family:monospace; margin:14px; }
 canvas { background:#1b1b24; border:1px solid #444; image-rendering:pixelated; }
 #hud { margin:6px 0; }
</style></head><body>
<div id="hud">loading…</div>
<canvas id="world" width="768" height="576"></canvas><br>
<canvas id="depth" width="768" height="24"></canvas><br>
<canvas id="sem" width="768" height="24"></canvas>
<div>arrows: world/agent &nbsp; W/S move &nbsp; R/F rotate &nbsp; space shoot &nbsp; B breed</div>
<script>
const SPECIES = ["#888", "#e5484d", "#46a758", "#3e7bfa", "#f5a623"];
let keys = {};
document.addEventListener("keydown", e => {
  keys[e.key.toLowerCase()] = true;
  if (["arrowup","arrowdown","arrowleft","arrowright"," "].includes(e.key.toLowerCase())) e.preventDefault();
});
async function tick() {
  const q = Object.keys(keys).join(","); keys = {};
  const r = await fetch("/step?keys=" + encodeURIComponent(q));
  const s = await r.json();
  const c = document.getElementById("world"), g = c.getContext("2d");
  const sx = c.width / s.lim[0], sy = c.height / s.lim[1];
  g.clearRect(0, 0, c.width, c.height);
  g.strokeStyle = "#333";
  for (let x = 0; x <= s.lim[0]; x += s.chunk) {
    g.beginPath(); g.moveTo(x*sx, 0); g.lineTo(x*sx, c.height); g.stroke(); }
  for (let y = 0; y <= s.lim[1]; y += s.chunk) {
    g.beginPath(); g.moveTo(0, y*sy); g.lineTo(c.width, y*sy); g.stroke(); }
  for (const f of s.food) {
    g.fillStyle = "#e9d94f";
    g.fillRect(f[0]*sx - 2, c.height - f[1]*sy - 2, 5, 5); }
  s.agents.forEach((a, i) => {
    const r0 = 2 + 4 * Math.min(1, a.health / 100);
    g.fillStyle = SPECIES[a.species] || "#888";
    g.beginPath();
    g.arc(a.x*sx, c.height - a.y*sy, r0, 0, 6.283); g.fill();
    g.strokeStyle = i === s.sel ? "#fff" : g.fillStyle;
    g.beginPath();
    g.moveTo(a.x*sx, c.height - a.y*sy);
    g.lineTo((a.x + 3*Math.cos(a.h))*sx, c.height - (a.y + 3*Math.sin(a.h))*sy);
    g.stroke();
    if (i === s.sel) { g.strokeStyle = "#fff"; g.beginPath();
      g.arc(a.x*sx, c.height - a.y*sy, r0 + 3, 0, 6.283); g.stroke(); }
  });
  drawStrip("depth", s.depth.map(v => [v, v, v]));
  drawStrip("sem", s.semantic.map(v => {
    const col = v < 0 ? "#000" : SPECIES[v] || "#888";
    return [parseInt(col.slice(1,3),16), parseInt(col.slice(3,5),16),
            parseInt(col.slice(5,7),16)]; }));
  document.getElementById("hud").textContent =
    `world ${s.world}  agent ${s.sel}  epoch ${s.step}  alive ${s.alive}` +
    `  health ${s.agents[s.sel] ? s.agents[s.sel].health : "-"}`;
  setTimeout(tick, 66);
}
function drawStrip(id, rgb) {
  const c = document.getElementById(id), g = c.getContext("2d");
  const w = c.width / rgb.length;
  rgb.forEach((p, i) => {
    g.fillStyle = `rgb(${p[0]},${p[1]},${p[2]})`;
    g.fillRect(i*w, 0, w+1, c.height); });
}
tick();
</script></body></html>"""


class WebViewer:
    """Owns a SimManager and serves the state; one sim step per poll by
    default (the browser's ~15 Hz poll becomes the sim clock)."""

    def __init__(self, num_worlds: int = 4, seed: int = 0,
                 init_agents: int = 32, autostep: bool = True, **mgr_kwargs):
        from madrona_bots_tpu.api.manager import SimManager
        self.mgr = SimManager(0, num_worlds, seed, init_agents, **mgr_kwargs)
        self.autostep = autostep
        self.world = 0
        self.agent = 0
        self.lock = threading.Lock()

    def _selected_slot(self):
        alive = np.asarray(self.mgr.state.alive[self.world])
        slots = np.flatnonzero(alive)
        if slots.size == 0:
            return 0
        self.agent = int(min(max(self.agent, 0), slots.size - 1))
        return int(slots[self.agent])

    def handle_keys(self, keys):
        cfg = self.mgr.cfg
        ks = set(k for k in keys if k)
        if "arrowup" in ks:
            self.world = min(cfg.num_worlds - 1, self.world + 1)
        if "arrowdown" in ks:
            self.world = max(0, self.world - 1)
        if "arrowright" in ks:
            self.agent += 1
        if "arrowleft" in ks:
            self.agent = max(0, self.agent - 1)
        act = dict(forward=int("w" in ks), backward=int("s" in ks),
                   rotate_left=int("r" in ks), rotate_right=int("f" in ks),
                   shoot=int(" " in ks or "space" in ks),
                   breed=int("b" in ks))
        if any(act.values()):
            self._selected_slot()
            offset = self.mgr.agent_offset_for_world(self.world)
            sensor_idx = self.mgr.sensor_index_tensor().to_numpy()
            row = int(sensor_idx[offset + self.agent, 0])
            self.mgr.set_action(row, **act)

    def step_and_snapshot(self, keys=()):
        with self.lock:
            self.handle_keys(keys)
            if self.autostep:
                self.mgr.step()
            s = self.mgr.state
            cfg = self.mgr.cfg
            w = self.world
            alive = np.asarray(s.alive[w])
            slots = np.flatnonzero(alive)
            sel_slot = self._selected_slot()
            agents = []
            for slot in slots:
                agents.append({
                    "x": float(s.pos[w, slot, 0]),
                    "y": float(s.pos[w, slot, 1]),
                    "h": float(s.heading[w, slot]),
                    "species": int(s.species[w, slot]),
                    "health": int(s.health[w, slot]),
                })
            fc = np.asarray(s.food_count[w])
            cells = np.asarray(s.food_cell[w])
            food = []
            for c, p in zip(*np.nonzero(fc)):
                cx, cy = c % cfg.num_chunks_x, c // cfg.num_chunks_x
                food.append([float(cx * cfg.chunk_width + cells[c, p, 0]),
                             float(cy * cfg.chunk_width + cells[c, p, 1])])
            return {
                "world": w,
                "sel": int(np.searchsorted(slots, sel_slot)) if slots.size else 0,
                "step": int(s.step_count),
                "alive": int(alive.sum()),
                "lim": [cfg.world_lim_x, cfg.world_lim_y],
                "chunk": cfg.chunk_width,
                "agents": agents,
                "food": food,
                "depth": np.asarray(s.sensor_depth[w, sel_slot]).tolist(),
                "semantic": np.asarray(s.sensor_semantic[w, sel_slot]).tolist(),
            }


def make_server(viewer: WebViewer, port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                ctype = "text/html"
            elif url.path in ("/state", "/step"):
                keys = parse_qs(url.query).get("keys", [""])[0].split(",")
                snap = viewer.step_and_snapshot(
                    keys if url.path == "/step" else ())
                body = json.dumps(snap).encode()
                ctype = "application/json"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_worlds", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init_agents", type=int, default=32)
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)
    viewer = WebViewer(args.num_worlds, args.seed, args.init_agents)
    srv = make_server(viewer, args.port)
    print(f"serving on http://127.0.0.1:{srv.server_address[1]}/  (ctrl-c to stop)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
