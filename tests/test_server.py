"""HTTP server tests: wire-format parity with the reference Flask app."""
import io
import json
import threading

import numpy as np
import pytest


class FakeModel:
    """serveModel-compatible stub so server tests don't build real nets."""

    def predict(self, image):
        assert image.ndim == 3
        return ["total", "4.20"]


def _make_client(app):
    """Minimal WSGI test client."""

    def request(method, path, body=b"", content_type=None):
        status_headers = {}

        def start_response(status, headers):
            status_headers["status"] = status
            status_headers["headers"] = dict(headers)

        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
        }
        if content_type:
            environ["CONTENT_TYPE"] = content_type
        chunks = app(environ, start_response)
        payload = json.loads(b"".join(chunks))
        return status_headers["status"], payload

    return request


def _multipart(filename, content, field="file"):
    boundary = "testboundary123"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="{field}"; '
        f'filename="{filename}"\r\n'
        f"Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + content + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


@pytest.fixture
def client(tmp_path):
    from lightly_ocr_tpu.serving.server import create_app

    app = create_app(FakeModel(), upload_folder=str(tmp_path))
    yield _make_client(app)
    app.worker.close()


def _png_bytes():
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.full((20, 30, 3), 128, np.uint8)
    ).save(buf, format="PNG")
    return buf.getvalue()


def test_health(client):
    status, payload = client("GET", "/")
    assert status == "200 OK"
    assert payload == {"status": "online"}


def test_api_happy_path(client):
    body, ctype = _multipart("receipt.png", _png_bytes())
    status, payload = client("POST", "/api", body, ctype)
    assert status == "200 OK"
    assert payload["status"] == "OK"
    assert payload["results"] == {"0": "total", "1": "4.20"}


def test_api_no_file_field(client):
    body, ctype = _multipart("receipt.png", _png_bytes(), field="other")
    status, payload = client("POST", "/api", body, ctype)
    assert status.startswith("403")
    assert payload == {"status": "noInput"}


def test_api_empty_filename(client):
    body, ctype = _multipart("", _png_bytes())
    status, payload = client("POST", "/api", body, ctype)
    assert status.startswith("403")
    assert payload == {"status": "emptyInput"}


def test_api_bad_extension(client):
    body, ctype = _multipart("malware.exe", b"MZ...")
    status, payload = client("POST", "/api", body, ctype)
    assert status.startswith("404")
    assert payload == {"status": "badInput"}


def test_api_corrupt_image(client):
    body, ctype = _multipart("x.png", b"not a png at all")
    status, payload = client("POST", "/api", body, ctype)
    assert status.startswith("404")
    assert payload == {"status": "badInput"}


def test_api_non_multipart_body(client):
    status, payload = client("POST", "/api", b"{}", "application/json")
    assert status.startswith("403")
    assert payload == {"status": "noInput"}


def test_unknown_route(client):
    status, payload = client("GET", "/nope")
    assert status.startswith("404")


def test_secure_filename():
    from lightly_ocr_tpu.serving.server import secure_filename

    assert secure_filename("../../etc/passwd") == "passwd"
    assert secure_filename("a b/c.png") == "c.png"
    assert secure_filename("..") != ".."
    assert secure_filename("") != ""


def test_worker_batches():
    from lightly_ocr_tpu.serving.server import InferenceWorker

    calls = []
    lock = threading.Event()

    def predict_fn(images):
        calls.append(len(images))
        lock.wait(0.01)
        return [["x"]] * len(images)

    w = InferenceWorker(predict_fn, max_batch=8)
    futs = [w.submit(np.zeros((4, 4, 3), np.uint8)) for _ in range(6)]
    lock.set()
    results = [f.result(timeout=5) for f in futs]
    assert all(r == ["x"] for r in results)
    w.close()
    assert sum(calls) == 6


def test_worker_error_propagates():
    from lightly_ocr_tpu.serving.server import InferenceWorker

    def predict_fn(images):
        raise RuntimeError("boom")

    w = InferenceWorker(predict_fn)
    fut = w.submit(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(RuntimeError):
        fut.result(timeout=5)
    w.close()
