from .model import SMPL, synthetic_smpl_model, save_model  # noqa: F401
