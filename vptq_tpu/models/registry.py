"""Known community VPTQ checkpoints.

Counterpart of the reference web app's model dropdown (reference:
vptq/app.py:19-72). Informational only — checkpoints load by path or
hub id through ``load_model``.
"""

COMMUNITY_MODELS = [
    # (hub id, approximate equivalent bitwidth)
    ("VPTQ-community/Meta-Llama-3.1-8B-Instruct-v8-k65536-256-woft", 3.0),
    ("VPTQ-community/Meta-Llama-3.1-8B-Instruct-v8-k65536-0-woft", 2.0),
    ("VPTQ-community/Meta-Llama-3.1-70B-Instruct-v8-k65536-0-woft", 2.0),
    ("VPTQ-community/Meta-Llama-3.1-70B-Instruct-v8-k65536-256-woft", 3.0),
    ("VPTQ-community/Meta-Llama-3.3-70B-Instruct-v8-k65536-256-woft", 3.0),
    ("VPTQ-community/Qwen2.5-7B-Instruct-v8-k65536-256-woft", 3.0),
    ("VPTQ-community/Qwen2.5-14B-Instruct-v8-k65536-256-woft", 3.0),
    ("VPTQ-community/Qwen2.5-32B-Instruct-v8-k65536-256-woft", 3.0),
    ("VPTQ-community/Qwen2.5-72B-Instruct-v8-k65536-256-woft", 3.0),
    ("VPTQ-community/Mistral-Large-Instruct-2407-v8-k65536-256-woft", 3.0),
    ("VPTQ-community/deepseek-r1", 2.5),
]

SUPPORTED_FAMILIES = (
    "llama",
    "mistral",
    "qwen2",
    "phi3",
    "mixtral",
    "deepseek_v2",
    "deepseek_v3",
)
