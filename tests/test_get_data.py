"""GetData downloader against a local zero-egress HTTP server
(capability of /root/reference/util/get_data.py:11-110)."""

import io
import os
import tarfile
import threading
import zipfile
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import numpy as np
import pytest

from dfmir_tpu.data.get_data import GetData, _AnchorLister

INDEX = """<html><body>
<a href="maps.zip">maps.zip</a>
<a href="horse2zebra.tar.gz">horse2zebra.tar.gz</a>
<a href="README.html">README.html</a>
<a href="notes.txt">notes.txt</a>
</body></html>"""


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataserver")
    (root / "index.html").write_text(INDEX)

    png = np.zeros((4, 4), np.uint8).tobytes()
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        z.writestr("maps/trainA/im0.raw", png)
        z.writestr("maps/trainB/im0.raw", png)
    (root / "maps.zip").write_bytes(zbuf.getvalue())

    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as t:
        info = tarfile.TarInfo("horse2zebra/trainA/im0.raw")
        info.size = len(png)
        t.addfile(info, io.BytesIO(png))
    (root / "horse2zebra.tar.gz").write_bytes(tbuf.getvalue())

    handler = partial(SimpleHTTPRequestHandler, directory=str(root))
    httpd = HTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_list_options_filters_archives(server):
    gd = GetData(mirror_url=f"{server}/index.html", verbose=False)
    assert gd.list_options() == ["maps.zip", "horse2zebra.tar.gz"]


def test_get_zip(server, tmp_path):
    gd = GetData(mirror_url=server, verbose=False)
    path = gd.get(str(tmp_path), dataset="maps.zip")
    assert path == str(tmp_path / "maps")
    assert os.path.exists(os.path.join(path, "trainA", "im0.raw"))
    assert not os.path.exists(str(tmp_path / "maps.zip"))  # temp removed


def test_get_targz(server, tmp_path):
    gd = GetData(mirror_url=server, verbose=False)
    path = gd.get(str(tmp_path), dataset="horse2zebra.tar.gz")
    assert os.path.exists(os.path.join(path, "trainA", "im0.raw"))


def test_existing_dir_voids_download(server, tmp_path):
    (tmp_path / "maps").mkdir()
    gd = GetData(mirror_url=server, verbose=False)
    with pytest.warns(UserWarning, match="already exists"):
        path = gd.get(str(tmp_path), dataset="maps.zip")
    assert path == str(tmp_path / "maps")
    assert not os.path.exists(os.path.join(path, "trainA"))


def test_unknown_technique_raises():
    with pytest.raises(ValueError, match="unknown technique"):
        GetData(technique="nope")


def test_unsafe_zip_rejected(server, tmp_path):
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        z.writestr("../evil.raw", b"x")
    evil = tmp_path / "srv"
    evil.mkdir()
    (evil / "evil.zip").write_bytes(zbuf.getvalue())
    handler = partial(SimpleHTTPRequestHandler, directory=str(evil))
    httpd = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    gd = GetData(
        mirror_url=f"http://127.0.0.1:{httpd.server_address[1]}",
        verbose=False)
    with pytest.raises(ValueError, match="unsafe archive member"):
        gd.get(str(tmp_path / "out"), dataset="evil.zip")
    httpd.shutdown()


def test_anchor_parser_plain():
    p = _AnchorLister()
    p.feed('<a href="x.zip">a.zip</a><a name="no-href">b.zip</a>')
    assert p.anchors == ["a.zip"]
