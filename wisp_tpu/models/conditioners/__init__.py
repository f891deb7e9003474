from wisp_tpu.models.conditioners.basic_conditioners import FiLM, FiLMConditioner
