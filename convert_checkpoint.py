#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint into an Orbax checkpoint for this
framework (capability superset of ``/root/reference/waveglow/convert_model.py``,
which only migrated old-layout WaveGlow pickles).

    python convert_checkpoint.py --kind tacotron --torch_ckpt checkpoint_10000 \
        --out_dir converted/taco
    python convert_checkpoint.py --kind waveglow --torch_ckpt waveglow_256ch.pt \
        --out_dir converted/wg [--config waveglow_config.json]
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", choices=["tacotron", "waveglow"], required=True)
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--config", default=None)
    args = parser.parse_args()

    from text2speech_tpu.config import HParams, WaveGlowConfig
    from text2speech_tpu.convert import (
        load_torch_checkpoint,
        tacotron_from_torch,
        waveglow_from_torch,
    )
    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import TrainState, create_train_state

    sd = load_torch_checkpoint(args.torch_ckpt)

    if args.kind == "tacotron":
        hp = HParams.load(args.hparams) if args.hparams else HParams()
        params, stats = tacotron_from_torch(sd, hp)
        state = create_train_state(hp, {"params": params, "batch_stats": stats})
    else:
        cfg = (
            WaveGlowConfig.from_json(args.config)
            if args.config
            else WaveGlowConfig()
        )
        params = waveglow_from_torch(sd, cfg)
        import optax

        tx = optax.adam(cfg.learning_rate)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats={},
            opt_state=tx.init(params),
            tx=tx,
        )

    mgr = CheckpointManager(args.out_dir)
    mgr.save(0, state, wait=True)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    print(f"converted {args.torch_ckpt} -> {args.out_dir} ({n:,} params)")


if __name__ == "__main__":
    main()
