from gymgo_tpu.models.az_net import AZNet, AZNetConfig, init_params, param_shardings
