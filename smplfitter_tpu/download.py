"""Interactive downloader for the MPI-licensed body model files.

Usage: ``python -m smplfitter_tpu.download [target_dir]``

The SMPL-family model files cannot be redistributed; each user must register at
the MPI project sites and download with their own credentials. This CLI
automates the authenticated downloads and lays the files out exactly where
:mod:`smplfitter_tpu` expects them (functional analogue of the reference
downloader, /root/reference/src/smplfitter/download.py:33-121).

Registration pages:
  https://smpl.is.tue.mpg.de/      (SMPL)
  https://smpl-x.is.tue.mpg.de/    (SMPL-X, deftrafo setups, flip corresp.)
  https://mano.is.tue.mpg.de/      (MANO / SMPL+H)
  https://agora.is.tue.mpg.de/     (kid templates)
"""

from __future__ import annotations

import argparse
import getpass
import http.cookiejar
import os
import os.path as osp
import sys
import urllib.parse
import urllib.request
import zipfile

DOWNLOAD_HOST = 'https://download.is.tue.mpg.de'

# domain -> [(remote file, local relative path, unzip?)]
FILE_REGISTRY = {
    'smpl': [
        ('SMPL_python_v.1.1.0.zip', 'smpl/', True),
    ],
    'smplx': [
        ('models_smplx_v1_1.zip', 'smplx/', True),
        ('smpl2smplx_deftrafo_setup.pkl', 'smpl2smplx_deftrafo_setup.pkl', False),
        ('smplx2smpl_deftrafo_setup.pkl', 'smplx2smpl_deftrafo_setup.pkl', False),
        ('smplx_flip_correspondences.npz', 'smplx/smplx_flip_correspondences.npz', False),
        ('MANO_SMPLX_vertex_ids.pkl', 'smplx/MANO_SMPLX_vertex_ids.pkl', False),
    ],
    'mano': [
        ('mano_v1_2.zip', 'mano/', True),
        ('smplh.tar.xz', 'smplh16/', True),
    ],
    'agora': [
        ('smpl_kid_template.npy', 'smpl/kid_template.npy', False),
        ('smplx_kid_template.npy', 'smplx/kid_template.npy', False),
    ],
}


def resolve_target_dir(arg_dir: str | None) -> str:
    if arg_dir:
        return arg_dir
    env = os.getenv('SMPLFITTER_BODY_MODELS')
    if env:
        return env
    data_root = os.getenv('DATA_ROOT')
    if data_root:
        return osp.join(data_root, 'body_models')
    return osp.abspath('body_models')


def make_opener():
    jar = http.cookiejar.CookieJar()
    return urllib.request.build_opener(urllib.request.HTTPCookieProcessor(jar))


def login_and_download(opener, domain: str, remote_file: str, dest_path: str,
                       username: str, password: str) -> None:
    """Authenticated download from the MPI download host (login form POST)."""
    url = (
        f'{DOWNLOAD_HOST}/download.php?domain={domain}&resume=1'
        f'&sfile={urllib.parse.quote(remote_file)}'
    )
    data = urllib.parse.urlencode(
        dict(username=username, password=password, commit='Login')
    ).encode()
    os.makedirs(osp.dirname(dest_path) or '.', exist_ok=True)
    req = urllib.request.Request(url, data=data)
    with opener.open(req) as resp, open(dest_path, 'wb') as out:
        ctype = resp.headers.get('Content-Type', '')
        if 'text/html' in ctype:
            raise RuntimeError(
                f'Login failed for domain {domain!r} — check credentials '
                f'(registered at https://{domain}.is.tue.mpg.de/?)'
            )
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)


def extract(archive_path: str, target_dir: str) -> None:
    if archive_path.endswith('.zip'):
        with zipfile.ZipFile(archive_path) as zf:
            zf.extractall(target_dir)
    elif archive_path.endswith(('.tar.xz', '.tar.gz', '.tar')):
        import tarfile

        with tarfile.open(archive_path) as tf:
            tf.extractall(target_dir)
    else:
        raise ValueError(f'Unknown archive type: {archive_path}')


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    parser.add_argument('target_dir', nargs='?', default=None,
                        help='body_models directory (default: resolved from env)')
    parser.add_argument('--domains', nargs='*', default=list(FILE_REGISTRY),
                        choices=list(FILE_REGISTRY),
                        help='which MPI domains to download from')
    args = parser.parse_args(argv)

    target = resolve_target_dir(args.target_dir)
    os.makedirs(target, exist_ok=True)
    print(f'Downloading body model files into {target}')
    print('You must be registered at each project site (see --help).')

    opener = make_opener()
    for domain in args.domains:
        print(f'\n== {domain} (https://{domain}.is.tue.mpg.de/) ==')
        username = input(f'  {domain} email: ').strip()
        password = getpass.getpass(f'  {domain} password: ')
        for remote_file, local_rel, unzip in FILE_REGISTRY[domain]:
            dest = osp.join(target, local_rel)
            if unzip:
                tmp = osp.join(target, f'.download_{osp.basename(remote_file)}')
                print(f'  downloading {remote_file} ...')
                login_and_download(opener, domain, remote_file, tmp, username, password)
                print(f'  extracting into {dest} ...')
                extract(tmp, dest)
                os.remove(tmp)
            else:
                if osp.exists(dest):
                    print(f'  {local_rel} already present, skipping')
                    continue
                print(f'  downloading {remote_file} -> {local_rel}')
                login_and_download(opener, domain, remote_file, dest, username, password)
    print('\nDone. Set SMPLFITTER_BODY_MODELS or DATA_ROOT accordingly.')
    return 0


if __name__ == '__main__':
    sys.exit(main())
