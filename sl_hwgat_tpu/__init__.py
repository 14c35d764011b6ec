"""sl_hwgat_tpu — a TPU-native framework for skeleton-based isolated sign-language
recognition with the capabilities of the reference `suvajit-patra/sl-hwgat` stack.

Layer map (bottom-up), mirroring SURVEY.md §7:

- ``graphs/``    skeleton graph IR: edge lists, dense/CSR adjacency, window metadata
- ``ops/``       compute kernels: fused adjacency-masked window attention (Pallas),
                 window partition/reverse index maps, pooling; jnp oracles + roofline
- ``models/``    Flax model zoo: HWGATE (flagship), HGATE, WGATE, GATE, STGCN,
                 DecoupledGCN, Transformer
- ``data/``      keypoint transform library, dataset/loader, preprocess packer,
                 meta generators, pose-extraction backends
- ``train/``     train-state, jit'd train/eval steps, checkpointing, reporting, CLI
- ``parallel/``  device-mesh setup and sharding rules (dp/sp/tp) for pjit/shard_map
- ``serve.py``   production inference: checkpoint → bucketed compiled Predictor

The compute path is JAX/XLA/Pallas; host-side data work is NumPy/SciPy as in the
reference (`/root/reference/hwgat`, a pure-PyTorch research codebase).
"""

__version__ = "0.2.0"
