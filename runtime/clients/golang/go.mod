module funasr_tpu_client

go 1.20
