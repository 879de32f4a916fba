"""Websocket server for the live mobile pipeline — rebuild of
/root/reference/scripts/server/server.py: receives phone JPEG frames
(EXIF/user-comment timestamp) and gyro/accel JSON, logs imu.csv, feeds the
tracker queue; streams rendered map frames back as base64 JPEG at ~10 Hz."""

from __future__ import annotations

import asyncio
import base64
import io
import json
import os
import time


class WebsocketServer:
    def __init__(self, cfg, server2tracker_queue, mapper2server_queue,
                 save_dir="output/server"):
        self.cfg = cfg
        self.s2t = server2tracker_queue
        self.m2s = mapper2server_queue
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.imu_csv = open(os.path.join(save_dir, "imu.csv"), "a")
        self.host = cfg.get("server", {}).get("host", "0.0.0.0")
        self.port = int(cfg.get("server", {}).get("port", 8765))
        self.send_hz = float(cfg.get("server", {}).get("send_hz", 10.0))

    # ------------------------------------------------------------------
    def _decode_frame(self, payload):
        """JPEG bytes -> (timestamp, rgb float array)."""
        import numpy as np
        from PIL import Image
        img = Image.open(io.BytesIO(payload))
        ts = time.time()
        exif = img.getexif()
        if exif:
            for tag in (306, 36867, 37510):   # DateTime / UserComment
                if tag in exif:
                    try:
                        ts = float(str(exif[tag]).strip("\x00"))
                        break
                    except ValueError:
                        pass
        rgb = np.asarray(img.convert("RGB"), np.float32) / 255.0
        return ts, rgb

    async def receive(self, ws):
        async for msg in ws:
            if isinstance(msg, (bytes, bytearray)):
                ts, rgb = self._decode_frame(bytes(msg))
                self.s2t.put({"timestamp": ts, "rgb": rgb})
            else:
                try:
                    d = json.loads(msg)
                except json.JSONDecodeError:
                    continue
                if "gyro" in d or "accel" in d:
                    row = [d.get("timestamp", time.time())]
                    row += list(d.get("gyro", [0, 0, 0]))
                    row += list(d.get("accel", [0, 0, 0]))
                    self.imu_csv.write(",".join(f"{v:.9f}" for v in row)
                                       + "\n")
                    self.imu_csv.flush()

    async def send(self, ws):
        period = 1.0 / self.send_hz
        while True:
            await asyncio.sleep(period)
            frame = None
            while not self.m2s.empty():
                frame = self.m2s.get_nowait()    # latest rendered frame
            if frame is None:
                continue
            import numpy as np
            from PIL import Image
            img = Image.fromarray(
                (np.clip(frame, 0, 1) * 255).astype("uint8"))
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=80)
            await ws.send(json.dumps(
                {"type": "render",
                 "jpeg": base64.b64encode(buf.getvalue()).decode()}))

    async def handler(self, ws):
        recv = asyncio.create_task(self.receive(ws))
        send = asyncio.create_task(self.send(ws))
        done, pending = await asyncio.wait(
            [recv, send], return_when=asyncio.FIRST_COMPLETED)
        for t in pending:
            t.cancel()

    async def serve(self):
        import websockets
        async with websockets.serve(self.handler, self.host, self.port):
            await asyncio.Future()

    def run(self):
        asyncio.run(self.serve())
