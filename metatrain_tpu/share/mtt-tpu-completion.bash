# Bash/zsh completion for the mtt-tpu CLI (python -m metatrain_tpu).
# TPU-native analogue of the reference's completion script
# (reference share/metatrain-completion.bash); matches the flags of
# metatrain_tpu/__main__.py. Source this file from your shell rc:
#   source .../metatrain_tpu/share/mtt-tpu-completion.bash

_mtt_tpu()
{
  local cur_word="${COMP_WORDS[$COMP_CWORD]}"
  local prev_word="${COMP_WORDS[$COMP_CWORD-1]}"
  local module="${COMP_WORDS[1]}"

  local yaml='!*@(.yml|.yaml)'
  local ckpt='!*@(.ckpt|.mtt)'
  local mtt='!*@(.mtt|.ckpt)'

  case "$module" in
    train)
      case "${prev_word}" in
        -h|--help|-o|--output|-r|--override)
          COMPREPLY=( )
          return 0
          ;;
        --restart)
          COMPREPLY=( $( compgen -W "auto" -f -X "$ckpt" -- "${cur_word}") )
          return 0
          ;;
        --profile)
          COMPREPLY=( $(compgen -d -- "${cur_word}") )
          return 0
          ;;
        *)
          if [[ $COMP_CWORD -eq 2 ]]; then
            COMPREPLY=( $(compgen -f -X "$yaml" -- "${cur_word}") )
            return 0
          fi
          ;;
      esac
      local opts="-h --help -o --output --restart --profile -r --override"
      COMPREPLY=( $(compgen -W "${opts}" -- "${cur_word}") )
      return 0
      ;;
    drive)
      case "${prev_word}" in
        -h|--help|--address|--port|--unix)
          COMPREPLY=( )
          return 0
          ;;
        *)
          if [[ $COMP_CWORD -eq 2 ]]; then
            COMPREPLY=( $(compgen -f -X "$mtt" -- "${cur_word}") )
            return 0
          elif [[ $COMP_CWORD -eq 3 ]]; then
            COMPREPLY=( $(compgen -f -- "${cur_word}") )
            return 0
          fi
          ;;
      esac
      local opts="-h --help --address --port --unix"
      COMPREPLY=( $(compgen -W "${opts}" -- "${cur_word}") )
      return 0
      ;;
    export)
      case "${prev_word}" in
        -h|--help|-o|--output|-r|--revision|-b|--branch|--token)
          COMPREPLY=( )
          return 0
          ;;
        -m|--metadata)
          COMPREPLY=( $(compgen -f -X "$yaml" -- "${cur_word}") )
          return 0
          ;;
        *)
          if [[ $COMP_CWORD -eq 2 ]]; then
            COMPREPLY=( $(compgen -f -X "$ckpt" -- "${cur_word}") )
            return 0
          fi
          ;;
      esac
      local opts="-h --help -o --output -m --metadata -r --revision -b --branch --token"
      COMPREPLY=( $(compgen -W "${opts}" -- "${cur_word}") )
      return 0
      ;;
    eval)
      case "${prev_word}" in
        -h|--help|-o|--output|-b|--batch-size|--check-consistency|--warm-up)
          COMPREPLY=( )
          return 0
          ;;
        --profile)
          COMPREPLY=( $(compgen -d -- "${cur_word}") )
          return 0
          ;;
        *)
          if [[ $COMP_CWORD -eq 2 ]]; then
            COMPREPLY=( $(compgen -f -X "$mtt" -- "${cur_word}") )
            return 0
          elif [[ $COMP_CWORD -eq 3 ]]; then
            COMPREPLY=( $(compgen -f -X "$yaml" -- "${cur_word}") )
            return 0
          fi
          ;;
      esac
      local opts="-h --help -o --output -b --batch-size --check-consistency --warm-up --profile"
      COMPREPLY=( $(compgen -W "${opts}" -- "${cur_word}") )
      return 0
      ;;
  esac

  local opts="drive eval export train -h --help"
  COMPREPLY=( $(compgen -W "${opts}" -- "${cur_word}") )
  return 0
}

if test -n "$ZSH_VERSION"; then
  autoload -U +X compinit && compinit
  autoload -U +X bashcompinit && bashcompinit
fi

complete -o bashdefault -F _mtt_tpu mtt-tpu
