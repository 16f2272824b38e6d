"""Web chat app with token streaming, model switching and live TPU
memory telemetry.

Parity with the reference's Gradio app (reference: vptq/app.py —
model dropdown of community checkpoints at app.py:19-72, lazy
single-model cache at app.py:91-115, streamed ChatInterface via
app_utils.get_chat_loop_generator at app_utils.py:109-164, live GPU
chart polled at app.py:146-189), built on the standard library
(gradio is not available in this environment). Serves:

  GET  /            — single-page chat UI (streaming, model dropdown)
  POST /api/chat    — {"messages": [...]} → completion; with
                      {"stream": true} responds as a Server-Sent
                      Events stream of token deltas, terminated by a
                      {"done": true, "tokens_per_s": N} event
  GET  /api/models  — {"models": [names], "current": name}
  POST /api/model   — {"name": ...} → lazily (re)load that model
  GET  /api/stats   — rolling TPU memory series + last decode tok/s

Run: python -m vptq_tpu.serving.webapp --model DIR [--port 7860]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from vptq_tpu.utils.device_monitor import DeviceMonitor

_PAGE = """<!doctype html>
<html><head><title>vptq_tpu chat</title><style>
body{font-family:sans-serif;max-width:780px;margin:2em auto}
#log{border:1px solid #ccc;padding:1em;min-height:240px;
     white-space:pre-wrap}
#stats{color:#666;font-size:0.85em;margin-top:0.6em}
textarea{width:100%%}select{margin-bottom:0.6em}</style></head><body>
<h2>vptq_tpu chat</h2>
<select id=model onchange=switchModel()></select>
<div id=log></div>
<textarea id=msg rows=3 placeholder="message"></textarea>
<button onclick=send()>send</button>
<div id=stats></div>
<script>
let messages=[];
async function loadModels(){
  const j=await (await fetch('/api/models')).json();
  const sel=document.getElementById('model');
  sel.innerHTML='';
  for(const m of j.models){
    const o=document.createElement('option');
    o.value=m;o.textContent=m;o.selected=(m===j.current);
    sel.appendChild(o);
  }
}
async function switchModel(){
  const name=document.getElementById('model').value;
  render('[loading '+name+'...]');
  await fetch('/api/model',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({name})});
  messages=[];render('');
}
async function send(){
  const t=document.getElementById('msg').value.trim();
  if(!t)return;
  messages.push({role:'user',content:t});
  document.getElementById('msg').value='';
  const r=await fetch('/api/chat',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({messages,stream:true})});
  const reader=r.body.getReader();
  const dec=new TextDecoder();
  let buf='',text='';
  for(;;){
    const {done,value}=await reader.read();
    if(done)break;
    buf+=dec.decode(value,{stream:true});
    let i;
    while((i=buf.indexOf('\\n\\n'))>=0){
      const line=buf.slice(0,i);buf=buf.slice(i+2);
      if(!line.startsWith('data: '))continue;
      const ev=JSON.parse(line.slice(6));
      if(ev.done){
        document.getElementById('stats').textContent=
          ev.tokens_per_s.toFixed(1)+' tok/s';
      }else{text+=ev.delta;render(text);}
    }
  }
  messages.push({role:'assistant',content:text});
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
  let line='';
  if(n)line='TPU memory: '+gb(s.bytes_in_use[n-1])+' / '+
    gb(s.bytes_limit[n-1])+' GB (peak '+gb(s.peak_bytes[n-1])+')';
  if(s.tokens_per_s)line+=' | '+s.tokens_per_s.toFixed(1)+' tok/s';
  document.getElementById('stats').textContent=line;
},1000);
loadModels();
</script></body></html>"""


class _State:
    generator = None
    tokenizer = None
    monitor: DeviceMonitor = None
    gen_args: dict = {}
    lock = threading.Lock()
    # model switching (reference app.py:91-115 single-model cache)
    models: dict = {}  # name -> path/hub-id
    current: str = ""
    load_fn = None  # (path) -> (generator, tokenizer)
    tokens_per_s: float = 0.0


def _switch_model(name: str) -> None:
    st = _State
    if name == st.current:
        return
    if name not in st.models:
        raise ValueError(f"unknown model {name!r}")
    if st.load_fn is None:
        raise ValueError("model switching not configured")
    with st.lock:
        # free the old model's HBM before loading the new one, but
        # restore it if the load fails — a bad hub id must not brick
        # the server
        old_gen, old_name = st.generator, st.current
        st.generator = None
        try:
            gen, tok = st.load_fn(st.models[name])
        except Exception:
            st.generator, st.current = old_gen, old_name
            raise
        st.generator = gen
        if tok is not None:
            st.tokenizer = tok
        st.current = name


def _generate(messages, stream_callback=None):
    """Run one chat completion; returns (text, tokens_per_s).

    ``stream_callback(delta_text)`` is invoked per decoded token.
    """
    st = _State
    out_ids = []
    text_so_far = [""]
    t0 = [0.0]
    n_tok = [0]

    def on_token(tok):
        if not n_tok[0]:
            t0[0] = time.perf_counter()
        n_tok[0] += 1
        out_ids.append(int(tok))
        if stream_callback is not None:
            full = st.tokenizer.decode(
                out_ids, skip_special_tokens=True
            )
            delta = full[len(text_so_far[0]):]
            text_so_far[0] = full
            if delta:
                stream_callback(delta)

    with st.lock:  # one TPU generation at a time; tokenize inside
        # the lock so a concurrent model switch cannot pair the old
        # tokenizer's ids with the newly loaded model
        ids = st.tokenizer.apply_chat_template(
            messages, add_generation_prompt=True
        )
        start = time.perf_counter()
        out = st.generator.generate(
            ids,
            eos_token_id=st.tokenizer.eos_token_id,
            stream_callback=on_token,
            **st.gen_args,
        )
        elapsed = time.perf_counter() - start
    text = st.tokenizer.decode(out, skip_special_tokens=True)
    tok_s = len(out) / max(elapsed, 1e-9)
    st.tokens_per_s = tok_s
    return text, tok_s


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
            stats = _State.monitor.series()
            stats["tokens_per_s"] = _State.tokens_per_s
            self._send(200, json.dumps(stats))
        elif self.path == "/api/models":
            self._send(200, json.dumps({
                "models": list(_State.models),
                "current": _State.current,
            }))
        else:
            self._send(404, json.dumps({"error": "not found"}))

    def _sse_event(self, obj) -> None:
        self.wfile.write(f"data: {json.dumps(obj)}\n\n".encode())
        self.wfile.flush()

    def _chat(self, payload) -> None:
        messages = payload.get("messages", [])
        if not messages:
            raise ValueError("messages required")
        if payload.get("stream"):
            # SSE: headers first, then one event per token delta.
            # After the headers are out a failure must be reported
            # as an SSE event — a second HTTP response would be an
            # invalid interleaved reply and hang the client reader.
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            try:
                content, tok_s = _generate(
                    messages,
                    stream_callback=lambda d: self._sse_event(
                        {"delta": d}
                    ),
                )
            except Exception as e:
                self._sse_event({"done": True, "error": str(e)})
                return
            self._sse_event({
                "done": True, "content": content,
                "tokens_per_s": tok_s,
            })
            return
        content, tok_s = _generate(messages)
        self._send(200, json.dumps({
            "content": content, "tokens_per_s": tok_s,
        }))

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/api/chat":
                self._chat(payload)
            elif self.path == "/api/model":
                _switch_model(payload.get("name", ""))
                self._send(
                    200, json.dumps({"current": _State.current})
                )
            else:
                self._send(404, json.dumps({"error": "not found"}))
        except Exception as e:  # surface errors to the client
            self._send(500, json.dumps({"error": str(e)}))


def serve(generator, tokenizer, port=7860, gen_args=None,
          models=None, current="", load_fn=None):
    _State.generator = generator
    _State.tokenizer = tokenizer
    _State.gen_args = gen_args or {
        "max_new_tokens": 256, "temperature": 0.7,
    }
    _State.models = dict(models or {})
    _State.current = current
    _State.load_fn = load_fn
    _State.tokens_per_s = 0.0
    _State.monitor = DeviceMonitor().start()
    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"serving on http://0.0.0.0:{port}", file=sys.stderr)
    return httpd


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--model", action="append", required=True,
        help="checkpoint dir or hub id (repeatable; first is loaded, "
             "the rest populate the dropdown)",
    )
    p.add_argument("--tokenizer", default="")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument(
        "--runtime-format", default="int8",
        choices=(
            "int8", "int4", "int4-mixed", "int3", "int3-mixed",
            "int2", "int2-mixed",
            "bf16", "codebook",
        ),
    )
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument(
        "--community-models", action="store_true",
        help="add the known community checkpoints to the dropdown "
             "(downloaded from the hub on first selection)",
    )
    p.add_argument(
        "--tp", type=int, default=0,
        help="tensor-parallel over this many chips (shard_map "
        "Megatron placement; 0 = single device)",
    )
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from vptq_tpu.models import load_model
    from vptq_tpu.serving.generate import Generator

    mesh = None
    if args.tp and args.tp > 1:
        import jax
        import numpy as np

        from vptq_tpu.parallel.sharding import make_mesh

        if args.runtime_format == "codebook":
            raise SystemExit(
                "--tp requires a runtime format (int8/int4/bf16); "
                "the codebook format does not run the shard_map path"
            )
        mesh = make_mesh(
            data=1, model=args.tp,
            devices=np.asarray(jax.devices()[: args.tp]),
        )

    def load_fn(path):
        model = load_model(
            path, dtype=jnp.bfloat16,
            runtime_format=args.runtime_format,
            mesh=mesh, parallel="tp",
        )
        gen = Generator(model, max_seq=args.max_seq, mesh=mesh)
        try:
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            tok = None
        return gen, tok

    models = {m: m for m in args.model}
    if args.community_models:
        from vptq_tpu.models.registry import COMMUNITY_MODELS

        models.update({mid: mid for mid, _bits in COMMUNITY_MODELS})

    first = args.model[0]
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer or first)
    gen, _ = load_fn(first)
    httpd = serve(
        gen, tokenizer, port=args.port,
        gen_args={
            "max_new_tokens": args.max_new_tokens,
            "temperature": args.temperature,
        },
        models=models, current=first, load_fn=load_fn,
    )
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
