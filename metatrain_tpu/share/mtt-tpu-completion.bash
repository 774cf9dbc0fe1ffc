# bash completion for mtt-tpu (reference: share/metatrain-completion.bash)
_mtt_tpu_completions() {
    local cur prev commands
    COMPREPLY=()
    cur="${COMP_WORDS[COMP_CWORD]}"
    prev="${COMP_WORDS[COMP_CWORD-1]}"
    commands="train eval export"

    if [[ ${COMP_CWORD} -eq 1 ]]; then
        COMPREPLY=( $(compgen -W "${commands}" -- "${cur}") )
        return 0
    fi

    case "${COMP_WORDS[1]}" in
        train)
            case "${prev}" in
                --restart) COMPREPLY=( $(compgen -W "auto" -f -- "${cur}") );;
                -o|--output) COMPREPLY=( $(compgen -f -- "${cur}") );;
                *) COMPREPLY=( $(compgen -f -X '!*.@(yaml|yml)' -- "${cur}") \
                               $(compgen -W "--restart -o --output -r --override" -- "${cur}") );;
            esac
            ;;
        eval)
            COMPREPLY=( $(compgen -f -X '!*.@(mtt|ckpt|yaml|yml)' -- "${cur}") \
                        $(compgen -W "-o --output -b --batch-size --check-consistency" -- "${cur}") )
            ;;
        export)
            COMPREPLY=( $(compgen -f -X '!*.ckpt' -- "${cur}") \
                        $(compgen -W "-o --output" -- "${cur}") )
            ;;
    esac
    return 0
}
complete -F _mtt_tpu_completions mtt-tpu
