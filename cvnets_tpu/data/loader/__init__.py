from cvnets_tpu.data.loader.dataloader import CVNetsDataLoader
