import io
import json

import pytest

from lightly_ocr_tpu.serving.ingress import (
    CO2,
    Store,
    User,
    create_ingress_app,
    create_table_query,
    fields_of,
    insert_query,
)


def test_fields_of():
    assert fields_of(User) == [
        ("userName", "TEXT"), ("userScore", "INTEGER"), ("imgPath", "TEXT")
    ]
    assert fields_of(CO2) == [("items", "TEXT"), ("emission", "REAL")]


def test_query_builders():
    assert "CREATE TABLE IF NOT EXISTS user" in create_table_query(User)
    assert insert_query(CO2) == (
        "INSERT INTO co2 (items, emission) VALUES (?, ?)"
    )


def test_store_crud(tmp_path):
    store = Store(str(tmp_path / "t.db"))
    rid = store.insert(User(userName="ada", userScore=7, imgPath="/a.png"))
    rows = store.select_all(User)
    assert rows == [
        {"id": rid, "userName": "ada", "userScore": 7, "imgPath": "/a.png"}
    ]
    store.update(User, rid, userScore=9)
    assert store.select_all(User)[0]["userScore"] == 9
    store.delete(User, rid)
    assert store.select_all(User) == []
    assert store.ping()
    store.close()


def _request(app, method, path, payload=None):
    body = json.dumps(payload).encode() if payload is not None else b""
    captured = {}

    def start_response(status, headers):
        captured["status"] = status

    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "CONTENT_LENGTH": str(len(body)),
        "wsgi.input": io.BytesIO(body),
    }
    out = json.loads(b"".join(app(environ, start_response)))
    return captured["status"], out


def test_ingress_api(tmp_path):
    store = Store(str(tmp_path / "api.db"))
    app = create_ingress_app(store)

    status, out = _request(app, "GET", "/health")
    assert status == "200 OK" and out == {"status": "online"}

    status, out = _request(
        app, "POST", "/users",
        {"userName": "bob", "userScore": 3, "imgPath": "/r.png"},
    )
    assert out["status"] == "OK"

    status, out = _request(app, "GET", "/users")
    assert out[0]["userName"] == "bob"

    status, out = _request(app, "POST", "/co2", {"items": "apple", "emission": 0.3})
    assert out["status"] == "OK"

    # probes
    status, out = _request(app, "POST", "/users", {"bogus": 1})
    assert status.startswith("400") and out["status"] == "badInput"
    status, out = _request(app, "GET", "/nope")
    assert status.startswith("404")
    store.close()


def test_store_threaded(tmp_path):
    import threading

    store = Store(str(tmp_path / "th.db"))
    errs = []

    def work(i):
        try:
            store.insert(User(userName=f"u{i}", userScore=i, imgPath=""))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(store.select_all(User)) == 8
    store.close()
