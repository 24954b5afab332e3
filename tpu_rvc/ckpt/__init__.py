from .torch_pth import load_pth, save_pth
from .convert import synthesizer_params_from_state_dict, state_dict_from_synthesizer_params
from .small_model import save_small_model, extract_small_model, merge, change_info

__all__ = [
    "load_pth",
    "save_pth",
    "synthesizer_params_from_state_dict",
    "state_dict_from_synthesizer_params",
    "save_small_model",
    "extract_small_model",
    "merge",
    "change_info",
]
