from .headers import init_header, header_apply
from .mult import init_supernet, supernet_apply, SupernetParams
from .sorting import sort_attn_heads, sort_attn_hidden, sort_ffn, sort_supernet
from .subnet import extract_subnet, subnet_apply

__all__ = [
    "init_header",
    "header_apply",
    "init_supernet",
    "supernet_apply",
    "SupernetParams",
    "extract_subnet",
    "subnet_apply",
    "sort_attn_heads",
    "sort_attn_hidden",
    "sort_ffn",
    "sort_supernet",
]
