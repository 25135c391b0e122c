from .headers import init_header, header_apply
from .mult import (init_supernet, supernet_apply, supernet_headers,
                   supernet_trunk, SupernetParams)
from .sorting import sort_attn_heads, sort_attn_hidden, sort_ffn, sort_supernet
from .subnet import extract_subnet, subnet_apply

__all__ = [
    "init_header",
    "header_apply",
    "init_supernet",
    "supernet_apply",
    "supernet_headers",
    "supernet_trunk",
    "SupernetParams",
    "extract_subnet",
    "subnet_apply",
    "sort_attn_heads",
    "sort_attn_hidden",
    "sort_ffn",
    "sort_supernet",
]
