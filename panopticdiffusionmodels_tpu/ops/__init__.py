from .attention import attention_qkv, multi_head_attention
