from .mlp import MLPConfig, init_mlp, apply_mlp, stack_params, PROD_VIS, PROD_DEPTH
from .proxy import ProxyModels, apply_grouped, random_proxy_models
