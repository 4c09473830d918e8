from s2r_tpu.data.loader import DataLoader, make_data_loader
