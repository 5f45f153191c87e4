"""Live dashboard server: endpoints, torn-write tolerance, path whitelist
(visdom-display equivalent, reference util/visualizer.py:99-223)."""

import json
import os
import urllib.request

import pytest

from dfmir_tpu.utils.plot_server import start_plot_server


@pytest.fixture()
def expr(tmp_path):
    d = tmp_path / "expt"
    img = d / "web" / "images"
    img.mkdir(parents=True)
    recs = [
        {"epoch": 1, "counter_ratio": 0.5,
         "losses": {"G": 1.0, "R": 2.0, "total": 3.0}},
        {"epoch": 2, "counter_ratio": 0.25,
         "losses": {"G": 0.5, "R": 1.5, "total": 2.0}},
    ]
    with open(d / "loss_history.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
        f.write('{"epoch": 3, "counter_')  # torn tail write (in-progress)
    # two epochs of gallery images; /images must return only the newest
    png = (b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    for name in ("epoch001_real_A.png", "epoch002_real_A.png",
                 "epoch002_fake_B.png", "not_an_epoch_image.png"):
        (img / name).write_bytes(png)
    return d, recs


@pytest.fixture()
def server(expr):
    d, recs = expr
    started = start_plot_server(str(d), "smoke", port=0, host="127.0.0.1")
    assert started is not None
    srv, thread = started
    yield f"http://127.0.0.1:{srv.server_address[1]}", recs
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_index_page(server):
    base, _ = server
    status, ctype, body = _get(base + "/")
    assert status == 200 and "text/html" in ctype
    assert b"smoke" in body and b"loss_history" in body


def test_history_skips_torn_tail(server):
    base, recs = server
    status, ctype, body = _get(base + "/history")
    assert status == 200 and "json" in ctype
    got = json.loads(body)
    assert got == recs  # the torn third line is silently dropped


def test_images_lists_newest_epoch_only(server):
    base, _ = server
    _, _, body = _get(base + "/images")
    assert json.loads(body) == ["epoch002_fake_B.png",
                                "epoch002_real_A.png"]
    status, ctype, png = _get(base + "/images/epoch002_fake_B.png")
    assert status == 200 and ctype == "image/png"
    assert png.startswith(b"\x89PNG")


def test_image_whitelist_blocks_non_gallery_paths(server):
    base, _ = server
    for path in ("/images/not_an_epoch_image.png",
                 "/images/..%2F..%2Floss_history.jsonl",
                 "/nope"):
        try:
            status, _, _ = _get(base + path)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 404, path


def test_port_conflict_degrades_gracefully(expr):
    d, _ = expr
    first = start_plot_server(str(d), "a", port=0, host="127.0.0.1")
    assert first is not None
    srv, _ = first
    try:
        port = srv.server_address[1]
        assert start_plot_server(str(d), "b", port=port,
                                 host="127.0.0.1") is None
    finally:
        srv.shutdown()
