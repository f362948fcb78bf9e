"""Model zoo: SEANet codec, RVQ, HuBERT, w2v-BERT conformer, fbank, GPT, Bark-fine.

Pure-functional JAX modules: each model is a config dataclass + explicit
parameter pytree (nested dicts of arrays) + jittable apply functions. This
keeps torch->JAX weight conversion transparent and makes sharding
annotations straightforward (params are plain pytrees).
"""
