"""Web app endpoints (dummy generator — no device needed)."""

import json
import threading
import urllib.error
import urllib.request


class _FakeTokenizer:
    eos_token_id = 0

    def apply_chat_template(self, messages, add_generation_prompt=True):
        return [1, 2, 3]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


class _FakeGenerator:
    def generate(self, ids, eos_token_id=None, stream_callback=None,
                 **kw):
        out = [7, 8, 9]
        if stream_callback is not None:
            for t in out:
                stream_callback(t)
        return out


def test_webapp_endpoints():
    from vptq_tpu.serving.webapp import serve

    httpd = serve(_FakeGenerator(), _FakeTokenizer(), port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"

        html = urllib.request.urlopen(base + "/").read().decode()
        assert "vptq_tpu chat" in html

        stats = json.loads(
            urllib.request.urlopen(base + "/api/stats").read()
        )
        assert "bytes_in_use" in stats

        req = urllib.request.Request(
            base + "/api/chat",
            data=json.dumps(
                {"messages": [{"role": "user", "content": "hi"}]}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        resp = json.loads(urllib.request.urlopen(req).read())
        assert resp["content"] == "7 8 9"
        assert resp["tokens_per_s"] > 0

        # tokens/s lands in the stats line after a completion
        stats = json.loads(
            urllib.request.urlopen(base + "/api/stats").read()
        )
        assert stats["tokens_per_s"] > 0

        # SSE streaming: per-token deltas then a done event
        req = urllib.request.Request(
            base + "/api/chat",
            data=json.dumps({
                "messages": [{"role": "user", "content": "hi"}],
                "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        r = urllib.request.urlopen(req)
        assert r.headers["Content-Type"] == "text/event-stream"
        events = [
            json.loads(line[len("data: "):])
            for line in r.read().decode().split("\n\n")
            if line.startswith("data: ")
        ]
        assert events[-1]["done"] is True
        assert events[-1]["content"] == "7 8 9"
        assert events[-1]["tokens_per_s"] > 0
        deltas = "".join(e["delta"] for e in events[:-1])
        assert deltas == "7 8 9"

        # error path: empty payload
        req = urllib.request.Request(
            base + "/api/chat", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        httpd.shutdown()


def test_webapp_model_switch():
    from vptq_tpu.serving.webapp import serve

    loads = []

    def load_fn(path):
        loads.append(path)
        return _FakeGenerator(), _FakeTokenizer()

    httpd = serve(
        _FakeGenerator(), _FakeTokenizer(), port=0,
        models={"a": "/ckpt/a", "b": "/ckpt/b"},
        current="a", load_fn=load_fn,
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        models = json.loads(
            urllib.request.urlopen(base + "/api/models").read()
        )
        assert models == {"models": ["a", "b"], "current": "a"}

        def post(path, obj):
            req = urllib.request.Request(
                base + path, data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
            )
            return json.loads(urllib.request.urlopen(req).read())

        assert post("/api/model", {"name": "b"})["current"] == "b"
        assert loads == ["/ckpt/b"]
        # switching to the already-current model is a no-op
        assert post("/api/model", {"name": "b"})["current"] == "b"
        assert loads == ["/ckpt/b"]
        # unknown model -> 500 with error surfaced
        try:
            post("/api/model", {"name": "zzz"})
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        httpd.shutdown()


def test_webapp_switch_failure_keeps_old_model():
    """A failing model switch must restore the previous generator
    (review finding: the server was bricked otherwise)."""
    from vptq_tpu.serving.webapp import _State, serve

    def bad_load(path):
        raise RuntimeError("download failed")

    gen = _FakeGenerator()
    httpd = serve(
        gen, _FakeTokenizer(), port=0,
        models={"good": "good", "bad": "bad"},
        current="good", load_fn=bad_load,
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            base + "/api/model",
            data=json.dumps({"name": "bad"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
        assert _State.generator is gen
        assert _State.current == "good"
        # chat still works on the restored model
        req = urllib.request.Request(
            base + "/api/chat",
            data=json.dumps(
                {"messages": [{"role": "user", "content": "hi"}]}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        resp = json.loads(urllib.request.urlopen(req).read())
        assert resp["content"] == "7 8 9"
    finally:
        httpd.shutdown()


def test_webapp_stream_error_is_sse_event():
    """A generation failure after SSE headers must arrive as a
    done+error event, not an interleaved second HTTP response."""
    from vptq_tpu.serving.webapp import serve

    class _Boom(_FakeGenerator):
        def generate(self, *a, **kw):
            raise RuntimeError("device fell over")

    httpd = serve(_Boom(), _FakeTokenizer(), port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            base + "/api/chat",
            data=json.dumps({
                "messages": [{"role": "user", "content": "hi"}],
                "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            body = r.read().decode()
        events = [
            json.loads(line[6:])
            for line in body.split("\n\n")
            if line.startswith("data: ")
        ]
        assert events and events[-1]["done"]
        assert "device fell over" in events[-1]["error"]
    finally:
        httpd.shutdown()
