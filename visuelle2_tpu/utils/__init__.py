from visuelle2_tpu.utils.seeding import seed_everything
from visuelle2_tpu.utils.tracing import trace, annotate

__all__ = ["seed_everything", "trace", "annotate"]
