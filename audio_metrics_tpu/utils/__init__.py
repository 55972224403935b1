from .serialize import save_state_dict, load_state_dict

__all__ = ["save_state_dict", "load_state_dict"]
