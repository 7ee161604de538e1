"""Pure-JAX model families.

One generic decoder transformer (`core.py`) covers every decoder-only family
the reference implements with separate torch modules (reference:
server/.../models/custom_modeling/*: flash_llama, flash_neox, flash_rw,
flash_santacoder, bloom, neox): differences are captured by `DecoderSpec`
(position encoding, norm type, GLU vs plain MLP, parallel residual,
MQA/GQA head counts, biases). Encoder-decoder (T5/mt0) lives in `t5.py`.

`families.py` maps HF `config.json` → `DecoderSpec` and HF checkpoint tensor
names → the stacked parameter pytree.
"""
