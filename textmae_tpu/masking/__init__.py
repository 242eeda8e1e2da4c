from textmae_tpu.masking.score_masking import apply_masking, get_ids_shuffle

__all__ = ["apply_masking", "get_ids_shuffle"]
