from zonos_tpu.serving.server import main

main()
