"""Fine-tuning subsystem (TPU-native extension; the reference is inference-only).

Flow-matching fine-tune of the FlowLM (backbone + flow head + text embeddings)
against (text, audio) pairs, with the Mimi codec frozen as the vocoder.  See
training/loss.py for the objective, training/data.py for how 32-dim latent
targets are recovered from the released checkpoint (least-squares preimage of
the DummyQuantizer output projection), and training/trainer.py for the
optax/jit/mesh plumbing.
"""

from pocket_tts_tpu.training.data import (
    encode_latent_targets,
    latent_preimage_matrix,
    make_batch,
)
from pocket_tts_tpu.training.loss import flow_matching_loss
from pocket_tts_tpu.training.lora import (
    apply_lora,
    init_lora,
    load_lora_params,
    make_lora_train_step,
    merge_lora,
    save_lora_params,
)
from pocket_tts_tpu.training.trainer import (
    apply_adapted,
    apply_finetuned,
    finetune,
    load_finetuned_params,
    make_optimizer,
    make_train_step,
    save_finetuned_params,
    shard_batch,
)

__all__ = [
    "encode_latent_targets",
    "latent_preimage_matrix",
    "make_batch",
    "flow_matching_loss",
    "make_optimizer",
    "make_train_step",
    "finetune",
    "apply_adapted",
    "apply_finetuned",
    "shard_batch",
    "save_finetuned_params",
    "load_finetuned_params",
    "init_lora",
    "merge_lora",
    "make_lora_train_step",
    "apply_lora",
    "save_lora_params",
    "load_lora_params",
]
