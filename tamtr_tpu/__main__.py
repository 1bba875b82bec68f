from tamtr_tpu.cli import main

main()
