"""Live viz stream (io/live_viz.py): the rviz-analog SSE feed end-to-end."""

import http.client
import json

import numpy as np

from agi_lidar_slam_tpu.io.live_viz import VizServer


def test_publish_reaches_sse_client():
    viz = VizServer(port=0).start()  # ephemeral port
    try:
        viz.publish([1.0, 2.0, 3.0], pose_q=[1, 0, 0, 0],
                    points=np.arange(30).reshape(10, 3))
        conn = http.client.HTTPConnection("127.0.0.1", viz.port, timeout=5)
        conn.request("GET", "/stream")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/event-stream")
        # publish a second frame after the client connected
        viz.publish([4.0, 5.0, 6.0])
        seen = []
        buf = b""
        while len(seen) < 2:
            chunk = resp.read1(65536)
            assert chunk, "stream closed early"
            buf += chunk
            while b"\n\n" in buf:
                raw, buf = buf.split(b"\n\n", 1)
                if raw.startswith(b"data: "):
                    seen.append(json.loads(raw[6:]))
        assert seen[0]["pose_t"] == [1.0, 2.0, 3.0]
        assert len(seen[0]["points"]) == 10
        assert seen[1]["pose_t"] == [4.0, 5.0, 6.0]
        conn.close()
    finally:
        viz.stop()


def test_decimation_and_page():
    viz = VizServer(port=0, max_points_per_scan=100).start()
    try:
        viz.publish(np.zeros(3), points=np.random.rand(10000, 3))
        conn = http.client.HTTPConnection("127.0.0.1", viz.port, timeout=5)
        conn.request("GET", "/")
        resp = conn.getresponse()
        page = resp.read().decode()
        assert "EventSource" in page and resp.status == 200
        conn.close()
        # the queued frame is decimated to the cap
        assert len(json.loads(viz._frames[-1][1])["points"]) <= 100
    finally:
        viz.stop()
