"""Web chat app with live TPU memory telemetry.

Parity with the reference's Gradio app (reference: vptq/app.py:
chat interface + live GPU chart polled every 0.1 s, app.py:146-189),
built on the standard library (gradio is not available in this
environment). Serves:

  GET  /            — single-page chat UI
  POST /api/chat    — {"messages": [{role, content}...]} → completion
  GET  /api/stats   — rolling TPU memory series for the live chart

Run: python -m vptq_tpu.serving.webapp --model DIR [--port 7860]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from vptq_tpu.utils.device_monitor import DeviceMonitor

_PAGE = """<!doctype html>
<html><head><title>vptq_tpu chat</title><style>
body{font-family:sans-serif;max-width:780px;margin:2em auto}
#log{border:1px solid #ccc;padding:1em;min-height:240px;
     white-space:pre-wrap}
#stats{color:#666;font-size:0.85em;margin-top:0.6em}
textarea{width:100%%}</style></head><body>
<h2>vptq_tpu chat</h2>
<div id=log></div>
<textarea id=msg rows=3 placeholder="message"></textarea>
<button onclick=send()>send</button>
<div id=stats></div>
<script>
let messages=[];
async function send(){
  const t=document.getElementById('msg').value.trim();
  if(!t)return;
  messages.push({role:'user',content:t});
  render('...');
  document.getElementById('msg').value='';
  const r=await fetch('/api/chat',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({messages})});
  const j=await r.json();
  messages.push({role:'assistant',content:j.content});
  render('');
}
function render(tail){
  document.getElementById('log').textContent=
    messages.map(m=>m.role+': '+m.content).join('\\n')+
    (tail?'\\nassistant: '+tail:'');
}
setInterval(async()=>{
  const s=await (await fetch('/api/stats')).json();
  const gb=x=>(x/1e9).toFixed(2);
  const n=s.bytes_in_use.length;
  if(n)document.getElementById('stats').textContent=
    'TPU memory: '+gb(s.bytes_in_use[n-1])+' / '+
    gb(s.bytes_limit[n-1])+' GB (peak '+gb(s.peak_bytes[n-1])+')';
},1000);
</script></body></html>"""


class _State:
    generator = None
    tokenizer = None
    monitor: DeviceMonitor = None
    gen_args: dict = {}
    lock = threading.Lock()


def _complete(messages):
    st = _State
    ids = st.tokenizer.apply_chat_template(
        messages, add_generation_prompt=True
    )
    with st.lock:  # one TPU generation at a time
        out = st.generator.generate(
            ids,
            eos_token_id=st.tokenizer.eos_token_id,
            **st.gen_args,
        )
    return st.tokenizer.decode(out, skip_special_tokens=True)


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _send(self, code, body, ctype="application/json"):
        data = body.encode() if isinstance(body, str) else body
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/" or self.path.startswith("/index"):
            self._send(200, _PAGE, "text/html")
        elif self.path == "/api/stats":
            self._send(200, json.dumps(_State.monitor.series()))
        else:
            self._send(404, json.dumps({"error": "not found"}))

    def do_POST(self):
        if self.path != "/api/chat":
            self._send(404, json.dumps({"error": "not found"}))
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            messages = payload.get("messages", [])
            if not messages:
                raise ValueError("messages required")
            content = _complete(messages)
            self._send(200, json.dumps({"content": content}))
        except Exception as e:  # surface errors to the client
            self._send(500, json.dumps({"error": str(e)}))


def serve(generator, tokenizer, port=7860, gen_args=None):
    _State.generator = generator
    _State.tokenizer = tokenizer
    _State.gen_args = gen_args or {
        "max_new_tokens": 256, "temperature": 0.7,
    }
    _State.monitor = DeviceMonitor().start()
    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"serving on http://0.0.0.0:{port}", file=sys.stderr)
    return httpd


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--tokenizer", default="")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--runtime-format", default="int8",
                   choices=("int8", "int4", "bf16", "codebook"))
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--max-seq", type=int, default=2048)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from vptq_tpu.models import load_model
    from vptq_tpu.serving.generate import Generator

    tokenizer = AutoTokenizer.from_pretrained(
        args.tokenizer or args.model
    )
    model = load_model(
        args.model, dtype=jnp.bfloat16,
        runtime_format=args.runtime_format,
    )
    gen = Generator(model, max_seq=args.max_seq)
    httpd = serve(
        gen, tokenizer, port=args.port,
        gen_args={
            "max_new_tokens": args.max_new_tokens,
            "temperature": args.temperature,
        },
    )
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
