"""Web app endpoints (dummy generator — no device needed)."""

import json
import threading
import urllib.request


class _FakeTokenizer:
    eos_token_id = 0

    def apply_chat_template(self, messages, add_generation_prompt=True):
        return [1, 2, 3]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


class _FakeGenerator:
    def generate(self, ids, eos_token_id=None, **kw):
        return [7, 8, 9]


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
