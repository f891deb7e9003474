from wisp_tpu.models.decoders.basic_decoders import BasicDecoder, get_weight_transform
